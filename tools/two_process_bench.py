"""Measured multi-process overhead: 1-process vs N-process engines.

SCALING.md's >99% island-efficiency claim was a communication-cost model;
this measures the real multi-process runtime's overhead on the only
hardware available (CPU: the same total virtual device count on 2 cores
in EVERY configuration, so compute oversubscription cancels and the
delta is the Gloo/DCN coordination cost of the dp axis spanning
processes).

  python tools/two_process_bench.py                       # 1 vs 2 proc, 4 devices
  TOTAL_DEVICES=8 NPROCS=2,4 python tools/two_process_bench.py   # the ladder

The NPROCS ladder (round-4 verdict #5) gives the per-collective
rendezvous model a second data point: does efficiency fall with process
count (rendezvous fan-in) at constant global work?

Child modes (internal): `single` (one process, TOTAL_DEVICES devices)
and `child <pid> <nproc> <port>` (nproc processes x TOTAL/nproc devices).
Fixed work: every instance runs exactly ITERS generations (termination
disabled), identical global shapes in every config.
"""
import os
import re
import socket
import subprocess
import sys
import time

B, N, POP, ITERS = 16, 5, 16, 120
RUNS = 3
SYNC = int(os.environ.get("SYNC_INTERVAL", "1"))
FUSED = os.environ.get("FUSED", "0") == "1"
MIG = int(os.environ.get("MIGRATION_INTERVAL", "10"))
SOLVER = os.environ.get("SOLVER", "island_de")  # island_de | pso | de_sharded
TOTAL = int(os.environ.get("TOTAL_DEVICES", "4"))
NPROCS = [int(x) for x in os.environ.get("NPROCS", "2").split(",")]
POP_AXIS = 2  # mesh pop-axis extent; dp = devices/POP_AXIS spans processes

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _solve_and_time(mesh, make_global):
    import jax

    from nlsolver_tpu.parallel import de_island, pso_sharded
    from nlsolver_tpu.problems import PROBLEMS
    from nlsolver_tpu.solvers.de import DEConfig
    from nlsolver_tpu.solvers.pso import PSOConfig

    import numpy as np

    x0_all = np.linspace(-2.0, 2.0, B * N, dtype=np.float32).reshape(B, N)
    keys_all = np.asarray(
        jax.random.key_data(jax.random.split(jax.random.key(7), B))
    )
    x0, keys_raw = make_global(x0_all, keys_all)

    if SOLVER == "de_sharded":
        from nlsolver_tpu.parallel import de_sharded

        dcfg = DEConfig(
            pop_size=POP, max_iter=ITERS, best_value_no_change=1 << 30, eps=0.0
        )

        @jax.jit
        def run(x0, keys_raw):
            res = de_sharded.minimize_sharded(
                PROBLEMS["sphere"].fn, x0, dcfg, mesh,
                keys=jax.random.wrap_key_data(keys_raw),
            )
            return res.f_value
    elif SOLVER == "pso":
        pcfg = PSOConfig(
            n_particles=POP, max_iter=ITERS,
            best_value_no_change=1 << 30, eps=0.0,
        )

        @jax.jit
        def run(x0, keys_raw):
            res = pso_sharded.minimize_sharded(
                PROBLEMS["sphere"].fn, x0, pcfg, mesh,
                keys=jax.random.wrap_key_data(keys_raw),
            )
            return res.f_value
    else:
        cfg = DEConfig(
            pop_size=POP, max_iter=ITERS, best_value_no_change=1 << 30, eps=0.0
        )

        @jax.jit
        def run(x0, keys_raw):
            res = de_island.minimize_islands(
                PROBLEMS["sphere"].fn, x0, cfg, mesh,
                keys=jax.random.wrap_key_data(keys_raw),
                sync_interval=SYNC,
                migration_interval=MIG,
                fused=FUSED,
            )
            return res.f_value

    jax.block_until_ready(run(x0, keys_raw))     # compile + warm
    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0, keys_raw))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def mode_single():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from nlsolver_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(TOTAL, dp=TOTAL // POP_AXIS, pop=POP_AXIS)
    med = _solve_and_time(mesh, lambda x0, keys: (x0, keys))
    print(f"SINGLE {med:.6f}", flush=True)


def mode_child(pid, nproc, port):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from nlsolver_tpu.parallel import distributed as dist

    dist.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = dist.global_mesh(pop=POP_AXIS)
    shard = NamedSharding(mesh, P("dp", None))

    def make_global(x0_all, keys_all):
        start, stop = dist.process_slice(B)
        return (
            jax.make_array_from_process_local_data(shard, x0_all[start:stop]),
            jax.make_array_from_process_local_data(shard, keys_all[start:stop]),
        )

    med = _solve_and_time(mesh, make_global)
    print(f"MULTI process={pid} {med:.6f}", flush=True)


def _run_nproc(nproc):
    s = socket.socket(); s.bind(("", 0)); port = s.getsockname()[1]; s.close()
    env = dict(
        os.environ,
        XLA_FLAGS=f"--xla_force_host_platform_device_count={TOTAL // nproc}",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "child", str(i),
             str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(nproc)
    ]
    times = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        assert p.returncode == 0, out[-2000:]
        mm = re.search(r"MULTI process=\d+ ([0-9.]+)", out)
        assert mm, out[-2000:]
        times.append(float(mm.group(1)))
    return max(times)


def orchestrate():
    env1 = dict(
        os.environ, XLA_FLAGS=f"--xla_force_host_platform_device_count={TOTAL}"
    )
    out1 = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "single"],
        capture_output=True, text=True, env=env1, timeout=900,
    )
    m = re.search(r"SINGLE ([0-9.]+)", out1.stdout)
    assert m, out1.stdout + out1.stderr[-2000:]
    t_single = float(m.group(1))

    print(f"solver={SOLVER} sync_interval={SYNC} fused={FUSED} "
          f"migration_interval={MIG} total_devices={TOTAL}")
    print(f"single-process ({TOTAL} devices): {t_single*1e3:8.1f} ms")
    for nproc in NPROCS:
        assert TOTAL % nproc == 0, (TOTAL, nproc)
        t_multi = _run_nproc(nproc)
        eff = t_single / t_multi
        print(f"{nproc}-process ({nproc}x{TOTAL//nproc} devices): "
              f"{t_multi*1e3:8.1f} ms   efficiency: {100*eff:6.1f}%")


if __name__ == "__main__":
    if len(sys.argv) == 1:
        orchestrate()
    elif sys.argv[1] == "single":
        mode_single()
    else:
        mode_child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
