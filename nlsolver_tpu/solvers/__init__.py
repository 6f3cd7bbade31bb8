from . import de, nelder_mead

__all__ = ["de", "nelder_mead"]
