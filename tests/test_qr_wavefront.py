"""Pallas wavefront QR (ops/qr_wavefront.py) — interpret-mode parity vs the
jnp Sameh-Kuck wavefront (linalg/qr_parallel.py) and LAPACK, plus the
in-kernel least-squares pipeline (tinyqr.h:253-310 / :437-470's roles at
fleet scale)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlsolver_tpu.linalg.qr_parallel import least_squares_parallel, qr_parallel
from nlsolver_tpu.ops.qr_wavefront import (
    least_squares_wavefront_pallas,
    qr_wavefront_pallas,
)


def batch(rng, m, n, B, dtype=np.float32):
    return jnp.asarray(rng.standard_normal((m, n, B)).astype(dtype))


@pytest.mark.parametrize("m,n", [(16, 16), (16, 8), (32, 8)])
def test_matches_jnp_wavefront(m, n):
    """Same schedule + same rotations as linalg.qr_parallel => the R and Q
    factors agree to f32 roundoff (identical arithmetic, different
    execution order inside fusions)."""
    rng = np.random.default_rng(m * 100 + n)
    B = 256
    A = batch(rng, m, n, B)
    R, Q = qr_wavefront_pallas(A, compute_q=True, tile=128, interpret=True)
    ref = qr_parallel(A)
    assert float(jnp.max(jnp.abs(R - ref.R))) < 1e-4
    assert float(jnp.max(jnp.abs(Q - ref.Q))) < 1e-4


def test_qr_is_a_factorization():
    """Q orthonormal, R upper-triangular, Q R == A to f32 precision."""
    rng = np.random.default_rng(0)
    m, n, B = 16, 8, 128
    A = batch(rng, m, n, B)
    R, Q = qr_wavefront_pallas(A, compute_q=True, tile=128, interpret=True)
    eye = jnp.eye(m, dtype=jnp.float32)[:, :, None]
    qtq = jnp.einsum(
        "ik...,il...->kl...", Q, Q, precision=jax.lax.Precision.HIGHEST
    )
    assert float(jnp.max(jnp.abs(qtq - eye))) < 1e-5
    rec = jnp.einsum(
        "ik...,kj...->ij...", Q, R, precision=jax.lax.Precision.HIGHEST
    )
    rel = float(jnp.max(jnp.abs(rec - A)) / jnp.max(jnp.abs(A)))
    assert rel < 1e-5
    # strict triangularity: the wavefront really annihilates every
    # subdiagonal entry (not just approximately reconstructs)
    sub = np.tril(np.ones((m, n)), -1).astype(bool)
    assert float(jnp.max(jnp.abs(jnp.asarray(np.asarray(R))[sub]))) < 1e-4


def test_least_squares_in_kernel():
    """The rhs-threading + in-kernel backsolve matches the jnp pipeline and
    solves exactly-determined systems to f32 precision."""
    rng = np.random.default_rng(3)
    m, n, B = 16, 8, 256
    A = batch(rng, m, n, B)
    y = jnp.asarray(rng.standard_normal((m, B)).astype(np.float32))
    x = least_squares_wavefront_pallas(A, y, tile=128, interpret=True)
    xr = least_squares_parallel(A, y)
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-4

    # square system: residual should vanish
    As = batch(rng, n, n, B)
    ys = jnp.asarray(rng.standard_normal((n, B)).astype(np.float32))
    xs = least_squares_wavefront_pallas(As, ys, tile=128, interpret=True)
    res = jnp.einsum("ij...,j...->i...", As, xs) - ys
    assert float(jnp.max(jnp.abs(res))) < 1e-3


def test_tile_smaller_than_batch():
    rng = np.random.default_rng(4)
    A = batch(rng, 8, 8, 512)
    R, _ = qr_wavefront_pallas(A, tile=128, interpret=True)
    ref = qr_parallel(A, compute_q=False)
    assert float(jnp.max(jnp.abs(R - ref.R))) < 1e-4


def test_shape_validation():
    A = jnp.zeros((4, 8, 128))
    with pytest.raises(ValueError, match="m >= n"):
        qr_wavefront_pallas(A, interpret=True)
    with pytest.raises(ValueError, match="rhs"):
        least_squares_wavefront_pallas(
            jnp.zeros((8, 4, 128)), jnp.zeros((4, 128)), interpret=True
        )


def test_lane_rule_padding():
    """Batches that violate the Mosaic lane rule (trailing block dim a
    multiple of 128 or == B) are padded and sliced back, for both the QR
    and the in-kernel least-squares paths."""
    rng = np.random.default_rng(9)
    for B in (300, 60):
        A = batch(rng, 8, 4, B)
        y = jnp.asarray(rng.standard_normal((8, B)).astype(np.float32))
        R, Q = qr_wavefront_pallas(A, compute_q=True, interpret=True)
        ref = qr_parallel(A)
        assert R.shape == (8, 4, B) and Q.shape == (8, 8, B)
        assert float(jnp.max(jnp.abs(R - ref.R))) < 1e-4
        x = least_squares_wavefront_pallas(A, y, interpret=True)
        xr = least_squares_parallel(A, y)
        assert x.shape == (4, B)
        assert float(jnp.max(jnp.abs(x - xr))) < 1e-4
        assert bool(jnp.all(jnp.isfinite(x)))


def test_qr_dispatcher_pallas_method():
    from nlsolver_tpu.linalg import qr

    rng = np.random.default_rng(5)
    A = batch(rng, 8, 8, 128)
    out = qr(A, method="pallas", interpret=True)
    ref = qr_parallel(A)
    assert float(jnp.max(jnp.abs(out.R - ref.R))) < 1e-4
    assert float(jnp.max(jnp.abs(out.Q - ref.Q))) < 1e-4


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled-kernel check; run with NLSOLVER_TEST_TPU=1 on the chip",
)
def test_on_chip_bit_exact_vs_jnp_wavefront():
    """On the real chip the Mosaic kernel must be BIT-exact vs the jnp
    wavefront (identical rotations, both f32) — the round-4 measurement
    that qualified the kernel (BENCH_NOTES)."""
    rng = np.random.default_rng(0)
    A = batch(rng, 16, 16, 512)
    y = jnp.asarray(rng.standard_normal((16, 512)).astype(np.float32))
    R, _ = qr_wavefront_pallas(A, tile=128)
    Rr = qr_parallel(A, compute_q=False).R
    assert float(jnp.max(jnp.abs(R - Rr))) == 0.0
    x = least_squares_wavefront_pallas(A, y, tile=128)
    xr = least_squares_parallel(A, y)
    assert float(jnp.max(jnp.abs(x - xr))) == 0.0


def test_vmem_fallback_to_jnp_wavefront():
    """Out-of-envelope shapes (review finding: e.g. m=128 with Q, whose
    working set exceeds the scoped-VMEM cap at any legal tile) degrade to
    the jnp wavefront instead of hanging the remote Mosaic compile.  The
    refusal is asserted at the real cap in-process; the degraded
    EXECUTION runs in a subprocess that shrinks the planner cap by
    module attribute (a shrunken in-process cap segfaulted jax's
    compile-cache layer when mixed with the full suite's jit state —
    isolated process, isolated caches)."""
    import os
    import subprocess
    import sys

    import nlsolver_tpu.ops.eigh_jacobi as ej

    m, n, B = 128, 8, 256
    # the planner must refuse the real Q-path working set at m=128 ...
    assert not ej.plan_lane_tiles(B, 128, (m * n + m * m) * 4)[2]
    # ... while the rhs-threading pipeline (no Q) still fits there
    assert ej.plan_lane_tiles(B, 128, (m * n + m + n) * 4)[2]

    child = """
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp, numpy as np
import nlsolver_tpu.ops.eigh_jacobi as ej
ej.VMEM_CAP = 1          # force the fallback for every shape
from nlsolver_tpu.ops.qr_wavefront import (
    least_squares_wavefront_pallas, qr_wavefront_pallas)
from nlsolver_tpu.linalg.qr_parallel import (
    least_squares_parallel, qr_parallel)
m, n, B = 12, 6, 192
rng = np.random.default_rng(2)
A = jnp.asarray(rng.standard_normal((m, n, B)).astype(np.float32))
y = jnp.asarray(rng.standard_normal((m, B)).astype(np.float32))
R, Q = qr_wavefront_pallas(A, compute_q=True)   # cap=1 -> jnp fallback
ref = qr_parallel(A)
assert R.shape == (m, n, B) and Q.shape == (m, m, B)
assert float(jnp.max(jnp.abs(R - ref.R))) < 1e-4
assert float(jnp.max(jnp.abs(Q - ref.Q))) < 1e-4
x = least_squares_wavefront_pallas(A, y)
xr = least_squares_parallel(A, y)
assert float(jnp.max(jnp.abs(x - xr))) < 1e-4
print('FALLBACK_OK')
"""
    env = dict(os.environ, JAX_PLATFORMS="")
    out = subprocess.run(
        [sys.executable, "-c", child], capture_output=True, text=True,
        env=env, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "FALLBACK_OK" in out.stdout
