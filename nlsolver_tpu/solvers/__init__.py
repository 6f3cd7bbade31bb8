from . import bfgs, brent, cgd, de, gd, lm, nelder_mead, pso, rootfind, sann

__all__ = [
    "bfgs",
    "brent",
    "cgd",
    "de",
    "gd",
    "lm",
    "nelder_mead",
    "pso",
    "rootfind",
    "sann",
]
