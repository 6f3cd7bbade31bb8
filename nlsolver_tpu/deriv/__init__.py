from .fd import FDConfig, fd_gradient, fd_hessian, fd_gradient_cost, fd_hessian_cost
from .api import Deriv, make_grad, make_hessian

__all__ = [
    "Deriv",
    "FDConfig",
    "fd_gradient",
    "fd_gradient_cost",
    "fd_hessian",
    "fd_hessian_cost",
    "make_grad",
    "make_hessian",
]
