from .armijo import ArmijoResult, armijo
from .more_thuente import MTResult, cstep, more_thuente

__all__ = ["ArmijoResult", "MTResult", "armijo", "cstep", "more_thuente"]
