from .eigh_qr import Eigh, eigh, eigh_qr
from .givens import QR, givens_rotation, qr, qr_givens, validate_qr
from .solve import (
    backsolve,
    cholesky,
    damped_solve,
    forwardsolve,
    least_squares,
    solve_cholesky,
)

__all__ = [
    "Eigh",
    "QR",
    "backsolve",
    "cholesky",
    "damped_solve",
    "eigh",
    "eigh_qr",
    "forwardsolve",
    "givens_rotation",
    "least_squares",
    "qr",
    "qr_givens",
    "solve_cholesky",
    "validate_qr",
]
