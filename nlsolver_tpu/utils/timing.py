"""Benchmark harness.

Re-creation of the reference's utils.h timing toolkit (Stopwatch :46-63,
StreamingMedian :77-117, benchmark/Benchmarker/benchmark_versions :121-210)
adapted to the async XLA execution model: every timed call is fenced with
``block_until_ready`` so device work is actually measured, and statistics
use the same median-of-runs methodology.
"""
from __future__ import annotations

import heapq
import statistics
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict

import jax


class Stopwatch:
    """Context-manager stopwatch (reference: RAII Stopwatch, utils.h:46-63)."""

    def __init__(self, name: str = "", verbose: bool = True):
        self.name = name
        self.verbose = verbose
        self.elapsed_us = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed_us = (time.perf_counter() - self._t0) * 1e6
        if self.verbose:
            label = f"[{self.name}] " if self.name else ""
            print(f"{label}elapsed: {self.elapsed_us:.1f}us")
        return False


class StreamingMedian:
    """Two-heap running median (reference: utils.h:77-117).

    A native C++ version lives in ``nlsolver_tpu.native``; this pure-Python
    one has no build dependency."""

    def __init__(self):
        self._lower: list = []  # max-heap (negated)
        self._upper: list = []  # min-heap

    def push(self, v: float) -> None:
        if not self._lower or v <= -self._lower[0]:
            heapq.heappush(self._lower, -v)
        else:
            heapq.heappush(self._upper, v)
        if len(self._lower) > len(self._upper) + 1:
            heapq.heappush(self._upper, -heapq.heappop(self._lower))
        elif len(self._upper) > len(self._lower):
            heapq.heappush(self._lower, -heapq.heappop(self._upper))

    @property
    def median(self) -> float:
        if not self._lower:
            return 0.0
        if len(self._lower) == len(self._upper):
            return (-self._lower[0] + self._upper[0]) / 2.0
        return -self._lower[0]


def benchmark(
    fn: Callable, *args, runs: int = 10, warmup: int = 2, **kwargs
) -> Dict[str, float]:
    """Median-of-runs timing (reference: benchmark, utils.h:121-149).

    Returns mean/median/min/max in microseconds; fences with
    block_until_ready.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append((time.perf_counter() - t0) * 1e6)
    return {
        "mean_us": statistics.fmean(times),
        "median_us": statistics.median(times),
        "min_us": min(times),
        "max_us": max(times),
        "runs": runs,
    }


@dataclass
class Benchmarker:
    """A/B speedup harness (reference: Benchmarker, utils.h:151-195)."""

    runs: int = 10
    warmup: int = 2
    results: Dict[str, Dict[str, float]] = field(default_factory=dict)

    def run(self, name: str, fn: Callable, *args, **kwargs) -> Dict[str, float]:
        stats = benchmark(fn, *args, runs=self.runs, warmup=self.warmup, **kwargs)
        self.results[name] = stats
        return stats

    def speedup(self, baseline: str, candidate: str) -> float:
        """Median-time ratio baseline/candidate (>1 => candidate faster)."""
        return (
            self.results[baseline]["median_us"]
            / self.results[candidate]["median_us"]
        )

    def report(self) -> str:
        lines = []
        for name, s in self.results.items():
            lines.append(
                f"{name}: median {s['median_us']:.1f}us "
                f"(mean {s['mean_us']:.1f}, min {s['min_us']:.1f}, "
                f"max {s['max_us']:.1f}, n={s['runs']})"
            )
        return "\n".join(lines)
