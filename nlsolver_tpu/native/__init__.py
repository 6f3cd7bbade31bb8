"""ctypes bindings for the native host-side library.

Builds ``libnlsolver_native.so`` from ``src/nlsolver_native.cpp`` on first
use (g++, cached next to the source).  Exposes:

  * reference-parity RNG sequence oracles (splitmix / xoshiro / xorshift /
    halton / recurrent) used by the parity tests for
    ``random/reference_rngs.py``;
  * ``now_us`` monotonic clock and ``StreamingMedian`` (the reference's
    two-heap benchmark statistic, utils.h:77-117).

``available()`` reports whether the library could be built; all callers
must degrade gracefully when it cannot (no compiler in the environment).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "nlsolver_native.cpp")
_LIB = os.path.join(_HERE, "libnlsolver_native.so")

_lock = threading.Lock()
_lib = None
_build_error = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB],
        check=True,
        capture_output=True,
    )


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.nls_splitmix_seq.argtypes = [
                ctypes.c_uint64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.nls_xoshiro_seq.argtypes = [ctypes.c_int, ctypes.POINTER(ctypes.c_double)]
            lib.nls_xorshift_seq.argtypes = [ctypes.c_int, ctypes.POINTER(ctypes.c_double)]
            lib.nls_halton_seq.argtypes = [
                ctypes.c_double,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.nls_recurrent_seq.argtypes = [
                ctypes.c_double,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.nls_now_us.restype = ctypes.c_double
            lib.nls_median_new.restype = ctypes.c_void_p
            lib.nls_median_push.argtypes = [ctypes.c_void_p, ctypes.c_double]
            lib.nls_median_get.argtypes = [ctypes.c_void_p]
            lib.nls_median_get.restype = ctypes.c_double
            lib.nls_median_free.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception as e:  # pragma: no cover - env without g++
            _build_error = e
        return _lib


def available() -> bool:
    return _load() is not None


def _seq(fn, n, *front_args):
    out = np.empty(n, np.float64)
    fn(*front_args, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def splitmix_seq(n: int, seed: int = 12374563468) -> np.ndarray:
    return _seq(_load().nls_splitmix_seq, n, ctypes.c_uint64(seed))


def xoshiro_seq(n: int) -> np.ndarray:
    return _seq(_load().nls_xoshiro_seq, n)


def xorshift_seq(n: int) -> np.ndarray:
    return _seq(_load().nls_xorshift_seq, n)


def halton_seq(n: int, base: float = 2.0) -> np.ndarray:
    return _seq(_load().nls_halton_seq, n, ctypes.c_double(base))


def recurrent_seq(n: int, seed: float = 0.5) -> np.ndarray:
    return _seq(_load().nls_recurrent_seq, n, ctypes.c_double(seed))


def now_us() -> float:
    return _load().nls_now_us()


class StreamingMedian:
    """Two-heap running median (reference: utils.h:77-117)."""

    def __init__(self):
        self._h = _load().nls_median_new()

    def push(self, v: float) -> None:
        _load().nls_median_push(self._h, float(v))

    @property
    def median(self) -> float:
        return _load().nls_median_get(self._h)

    def __del__(self):
        try:
            if self._h:
                _load().nls_median_free(self._h)
                self._h = None
        except Exception:
            pass
