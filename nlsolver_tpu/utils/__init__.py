from .checkpoint import load, save
from .observability import debug_nans, log_compiles, trace
from .timing import Benchmarker, Stopwatch, StreamingMedian, benchmark

__all__ = [
    "Benchmarker",
    "Stopwatch",
    "StreamingMedian",
    "benchmark",
    "debug_nans",
    "load",
    "log_compiles",
    "save",
    "trace",
]
