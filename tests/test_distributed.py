"""Multi-process distributed bring-up (parallel/distributed.py).

Round-2 verdict: `jax.distributed.initialize` was wrapped but never
executed, even CPU-emulated.  This launches TWO real OS processes, each
with 2 virtual CPU devices, connected through a localhost coordinator
(Gloo collectives over the 4-device global mesh), runs `minimize_islands`
with the dp axis spanning the processes — the DCN axis of a pod-slice
deployment — and checks the stitched global result against a
single-process run of the identical mesh shape: per-(instance, agent,
iteration) streams come from fold_in, so results must not depend on how
the mesh maps onto processes.
"""
import os
import re
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlsolver_tpu.parallel import de_island
from nlsolver_tpu.parallel.mesh import make_mesh
from nlsolver_tpu.problems import PROBLEMS
from nlsolver_tpu.solvers.de import DEConfig

CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "distributed_child.py")
B, N = 8, 5


def _free_port():
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(pid, nproc, port):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    return subprocess.Popen(
        [sys.executable, CHILD, str(pid), str(nproc), str(port)],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
    )


def _single_process_reference():
    # the children run with default (32-bit) jax; disable the suite's x64
    # so weak-type promotion matches and the comparison can be bit-exact
    with jax.enable_x64(False):
        mesh = make_mesh(4, dp=2, pop=2)
        cfg = DEConfig(pop_size=16, max_iter=150)
        x0 = jnp.asarray(
            np.linspace(-2.0, 2.0, B * N, dtype=np.float32).reshape(B, N)
        )
        keys = jax.random.split(jax.random.key(7), B)
        res = jax.jit(
            lambda x0, keys: de_island.minimize_islands(
                PROBLEMS["sphere"].fn, x0, cfg, mesh, keys=keys
            )
        )(x0, keys)
        return np.asarray(res.f_value)


def test_two_process_islands_match_single_process():
    port = _free_port()
    procs = [_launch(i, 2, port) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert f"OK process={i}" in out, out[-3000:]

    got = np.full(B, np.nan, np.float32)
    for out in outs:
        for m in re.finditer(r"RESULT (\d+) np\.float32\(([^)]+)\)", out):
            got[int(m.group(1))] = np.float32(m.group(2))
    assert not np.isnan(got).any(), got

    want = _single_process_reference()
    # fold_in-derived streams make the result independent of the
    # process/mesh layout; f32 kernels reordered across backends still
    # reduce identically here (empirically bit-exact; keep a tight net)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
    assert np.all(got < 1e-2)  # and the solves actually converged


def test_initialize_single_process_is_safe():
    # without kwargs and without a coordinator this must stay a no-op
    from nlsolver_tpu.parallel import distributed

    distributed.initialize()
    assert jax.process_count() == 1


def test_initialize_propagates_explicit_errors():
    from nlsolver_tpu.parallel import distributed

    with pytest.raises((ValueError, RuntimeError)):
        # backend already initialized in-process -> must raise, not swallow
        distributed.initialize(
            coordinator_address="127.0.0.1:1", num_processes=2, process_id=0
        )
