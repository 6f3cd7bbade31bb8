"""Throughput benchmark — batched solver iterations/s/chip.

Headline (stdout, ONE JSON line): batched Differential Evolution over 8192
independent 10-D Rastrigin instances, 64 agents each, 200 generations via
the fixed-trip scan driver — per-instance solver iterations per second on
one chip, against the BASELINE.json north star of 1e5 iterations/s/chip.
(8192 instances saturates one v5e chip; 2048 reaches only ~45% of peak.)

``python bench.py --all`` additionally runs every BASELINE.json config
scenario (NM single, PSO/SANN 100-D swarms, 10k-batch BFGS, 100k root
finders, LM fit fleet) and prints their numbers on stderr.
"""
import json
import sys

NORTH_STAR = 1.0e5  # BASELINE.json: >=1e5 batched solver iterations/s/chip


def main():
    import jax

    from nlsolver_tpu.benches import ALL_BENCHES, bench_de_batched

    dev = jax.devices()[0]
    if "--all" in sys.argv:
        for name, fn in ALL_BENCHES.items():
            try:
                out = fn()
                print(f"# {json.dumps(out)}", file=sys.stderr)
            except Exception as e:
                print(f"# {name} FAILED: {e!r}", file=sys.stderr)

    head = bench_de_batched()
    print(
        f"# device={dev.platform}:{dev.device_kind} "
        f"median={head['median_ms']:.2f}ms min={head['min_ms']:.2f}ms; "
        f"{head['instances']} instances x {head['generations']} DE generations",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "batched_de_solver_iterations_per_sec_per_chip",
                "value": round(head["iters_per_sec"], 1),
                "unit": "iter/s",
                "vs_baseline": round(head["iters_per_sec"] / NORTH_STAR, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
