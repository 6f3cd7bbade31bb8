"""Throughput benchmark — batched solver iterations/s/chip.

Flagship config (BASELINE.json config #2/#3 hybrid): vmapped Differential
Evolution over B independent 10-D Rastrigin instances, pop_size agents each,
fixed generation count via the scan driver.  Metric counts per-instance
solver iterations (generations) completed per second on one chip — the
north-star target in BASELINE.json is >= 1e5 iterations/s/chip, reported as
``vs_baseline`` (value / 1e5).

Methodology mirrors the reference's utils.h benchmark harness
(median-of-runs, utils.h:121-210) with ``block_until_ready`` fencing.

Prints exactly ONE JSON line on stdout.
"""
import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

from nlsolver_tpu.core.driver import drive_scan
from nlsolver_tpu.problems import PROBLEMS
from nlsolver_tpu.solvers import de

B = 1024          # problem instances per chip
DIM = 10
POP = 64
ITERS = 200       # generations per timed run
WARMUP = 2
RUNS = 5

NORTH_STAR = 1.0e5  # BASELINE.json: >=1e5 batched solver iterations/s/chip


def main():
    fn = PROBLEMS["rastrigin"].fn
    # disable tolerance-based termination so every lane does ITERS generations
    cfg = de.DEConfig(
        pop_size=POP, max_iter=1 << 30, best_value_no_change=1 << 30, eps=0.0
    )

    x0 = jnp.full((B, DIM), -0.5, dtype=jnp.float32)
    keys = jax.random.split(jax.random.key(0), B)

    @jax.jit
    def run(x0, keys):
        states = jax.vmap(lambda x, k: de.init(fn, x, cfg, k))(x0, keys)
        final = drive_scan(
            jax.vmap(lambda s: de.step(fn, s, cfg)), states, ITERS
        )
        return jnp.min(final.scores, axis=-1)

    for _ in range(WARMUP):
        run(x0, keys).block_until_ready()

    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        run(x0, keys).block_until_ready()
        times.append(time.perf_counter() - t0)

    t = statistics.median(times)
    iters_per_sec = B * ITERS / t
    dev = jax.devices()[0]
    print(
        f"# device={dev.platform}:{dev.device_kind} median={t*1e3:.2f}ms "
        f"min={min(times)*1e3:.2f}ms over {RUNS} runs; "
        f"{B} instances x {ITERS} DE generations (pop={POP}, dim={DIM})",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "batched_de_solver_iterations_per_sec_per_chip",
                "value": round(iters_per_sec, 1),
                "unit": "iter/s",
                "vs_baseline": round(iters_per_sec / NORTH_STAR, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
