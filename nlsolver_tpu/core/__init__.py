from .driver import drive, drive_scan, drive_trace
from .objective import (Bounds, Objective, batch_eval, resolve_bounds, signed,
                        with_eval_dtype)
from .result import SolverResult, make_result
from .utils import clamp, max_abs, std_err, tree_where

__all__ = [
    "Bounds",
    "Objective",
    "SolverResult",
    "batch_eval",
    "clamp",
    "drive",
    "drive_scan",
    "drive_trace",
    "make_result",
    "max_abs",
    "resolve_bounds",
    "signed",
    "with_eval_dtype",
    "std_err",
    "tree_where",
]
