from . import bfgs, cgd, de, gd, lm, nelder_mead, pso, sann

__all__ = ["bfgs", "cgd", "de", "gd", "lm", "nelder_mead", "pso", "sann"]
