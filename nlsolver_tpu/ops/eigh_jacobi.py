"""Pallas batched symmetric eigensolver: parallel-order cyclic Jacobi.

The tinyqr-class kernel (tinyqr.h:317-434 is the reference's iterated-QR
eigensolver; its TPU consumer is the CMA-ES fleet, which needs thousands of
small [n, n] eigendecompositions per generation).  Layout and schedule
follow ``linalg.jacobi``: batch-minor ``[n, n, B]`` with the batch on the
128-lane axis, a round-robin tournament of n/2 disjoint rotations per
round, n-1 rounds per sweep.

Kernel-specific choices:

  * the batch is tiled on the lane axis (``tile`` lanes per program); A and
    V tiles live entirely in VMEM across all sweeps — one HBM read and one
    write per element regardless of sweep count (the pure-XLA path keeps
    this property only if fusion wins; here it is structural);
  * every index is **static**: rows/columns are moved with unrolled
    ``[1, T]``-slice concatenations instead of gathers, and scalar pair
    entries are ``[k, T]`` stacks — nothing Mosaic has to lower as dynamic
    addressing (1-D intermediates are avoided throughout: this machine's
    Mosaic helper rejects 1-D blocks, see ops/rank2.py);
  * sweeps run in a ``fori_loop`` so code size stays one-sweep-sized.

``eigh_jacobi_pallas`` takes ``[n, n, B]`` and returns the same
``(eigenvalues [n, B], eigenvectors [n, n, B])`` contract as
``linalg.jacobi.eigh_jacobi`` on batch-minor input.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..linalg.eigh_qr import Eigh
from ..linalg.jacobi import _rotation, round_robin_schedule


def _round(A, V, ps, qs, perm, dtype):
    """Apply one tournament round's n/2 disjoint rotations to the whole
    [n, n, T] tile with static-slice data movement only."""
    n = A.shape[0]
    app = jnp.concatenate([A[p, p : p + 1] for p in ps], axis=0)     # [k, T]
    aqq = jnp.concatenate([A[q, q : q + 1] for q in qs], axis=0)
    apq = jnp.concatenate([A[p, q : q + 1] for p, q in zip(ps, qs)], axis=0)
    c, s = _rotation(app, aqq, apq, dtype)

    role = {}                       # row -> (pair index, sign of s)
    for i, (p, q) in enumerate(zip(ps, qs)):
        role[int(p)] = (i, -1.0)
        role[int(q)] = (i, 1.0)

    crows, srows = [], []
    T = A.shape[-1]
    ones = jnp.ones((1, T), dtype)
    zeros = jnp.zeros((1, T), dtype)
    for r in range(n):
        if r in role:
            i, sign = role[r]
            crows.append(c[i : i + 1])
            srows.append(sign * s[i : i + 1])
        else:                       # bye row (odd n): identity rotation
            crows.append(ones)
            srows.append(zeros)
    Cv = jnp.concatenate(crows, axis=0)          # [n, T]
    Sv = jnp.concatenate(srows, axis=0)

    Arows = jnp.stack([A[int(perm[r])] for r in range(n)], axis=0)   # [n, n, T]
    A = Cv[:, None] * A + Sv[:, None] * Arows                        # J^T A
    Acols = jnp.concatenate(
        [A[:, int(j) : int(j) + 1] for j in perm], axis=1
    )                                                                # [n, n, T]
    A = Cv[None] * A + Sv[None] * Acols                              # (J^T A) J
    Vcols = jnp.concatenate(
        [V[:, int(j) : int(j) + 1] for j in perm], axis=1
    )
    V = Cv[None] * V + Sv[None] * Vcols                              # V J
    return A, V


def _kernel(A_ref, out_w_ref, out_v_ref, *, n, sweeps, schedule):
    dtype = A_ref.dtype
    A = A_ref[...]
    A = (A + jnp.swapaxes(A, 0, 1)) * jnp.asarray(0.5, dtype)
    T = A.shape[-1]
    V = jnp.broadcast_to(jnp.eye(n, dtype=dtype)[:, :, None], (n, n, T))

    def sweep(_, state):
        A, V = state
        for ps, qs, perm, _unused in schedule:
            A, V = _round(A, V, ps, qs, perm, dtype)
        return A, V

    A, V = jax.lax.fori_loop(0, sweeps, sweep, (A, V))
    out_w_ref[...] = jnp.concatenate([A[i, i : i + 1] for i in range(n)], axis=0)
    out_v_ref[...] = V


#: scoped-VMEM budget for one program's working set.  The hardware limit
#: on this toolchain is 16 MB (measured: an n=64, tile=128 call was
#: rejected at 19.47 MB — which calibrates the per-lane working set at
#: ~9.3x the A-block bytes, not the naive 3x); budget 14 MB through a
#: conservative 10x multiplier.
VMEM_CAP = 14 * 1024 * 1024
_WORKSET_MULT = 10


def plan_lane_tiles(B: int, tile: int, resident_bytes_per_lane: int,
                    mult: float | None = None, cap: int | None = None):
    """Shared lane-tile planner for VMEM-resident batch-minor kernels
    (this eigensolver and ops/qr_wavefront.py): the Mosaic lane rule
    (trailing block dim a multiple of 128 or == B) plus the scoped-VMEM
    budget (``mult`` x the per-lane resident block bytes, default the
    conservative ``_WORKSET_MULT``/``VMEM_CAP``; a kernel with a measured
    multiplier may pass its own calibration).  Returns
    (tile, padded_B, fits)."""
    # resolve at call time so tests can shrink the module-level cap
    if mult is None:
        mult = _WORKSET_MULT
    if cap is None:
        cap = VMEM_CAP
    need = int(mult * resident_bytes_per_lane)
    if B < 128:
        return B, B, need * B < cap
    tile = max(128, min(tile, B) // 128 * 128)
    while tile > 128 and need * tile >= cap:
        tile = (tile // 2) // 128 * 128
    return tile, B + (-B) % tile, need * tile < cap


#: this kernel's CALIBRATED working-set model (round-5 on-chip points):
#: n=56 tile=128 (14.9 MB at 9.3x) COMPILES AND RUNS; n=64 needs 19.47 MB
#: and is rejected (hardware scoped-VMEM limit 16 MB).  A bf16-compute
#: variant (19.05 MB) and a sweep-streamed in/out-aliased variant
#: (24.35 MB) were also measured over the limit — the peak is Mosaic
#: staging, not payload dtype (BENCH_NOTES round 5).  9.5x against
#: 15.5 MB accepts n<=56 and rejects n>=60, matching every measurement.
_EIGH_MULT = 9.5
_EIGH_CAP = int(15.5 * 1024 * 1024)


def plan_tiles(n: int, B: int, tile: int, itemsize: int):
    """Resolve the (tile, padded batch, use_pallas) envelope for an
    [n, n, B] problem under two hard constraints (both measured on this
    toolchain, tests/test_jacobi_eigh.py unit-tests the planner):

    * Mosaic's lane rule: the trailing block dim must be a MULTIPLE OF
      128 or equal the whole batch — so the tile ladder is 128k (or
      exactly B when B < 128); sub-128 tiles of a larger batch are
      rejected by the compiler, not just slow.
    * scoped VMEM: ``_EIGH_MULT`` x the [n, n, tile] block bytes must fit
      ``_EIGH_CAP`` (calibrated: n=56 compiles at 14.9 MB, n=64 is
      rejected at 19.47 MB).

    Returns ``use_pallas=False`` when no legal tile fits (n >= 60 at f32
    with B >= 128) — the caller degrades to the jnp Jacobi (same
    schedule, no VMEM-residency win) instead of crashing."""
    t, Bp, fits = plan_lane_tiles(
        B, tile, n * n * itemsize, mult=_EIGH_MULT, cap=_EIGH_CAP
    )
    if not fits:
        return t, B, False
    return t, Bp, True


@functools.partial(
    jax.jit, static_argnames=("sweeps", "tile", "sort", "interpret")
)
def eigh_jacobi_pallas(
    A_bm: jax.Array,
    sweeps: int = 10,
    tile: int = 128,
    sort: bool = True,
    interpret: bool = False,
) -> Eigh:
    """Batched eigendecomposition of ``A_bm``: ``[n, n, B]`` batch-minor.

    Returns eigenvalues ``[n, B]`` and eigenvectors ``[n, n, B]`` (column k
    on axis 1).  ``sort=False`` skips the ascending sort — the CMA-ES fleet
    does not need ordered spectra and saves the gather.

    Envelope (round-5 calibration): the kernel path covers n <= 56 at f32
    with 128-lane tiles (n=56: 1.19x the jnp Jacobi, 7.6x XLA eigh,
    measured on-chip).  Past that every design measured goes over the
    16 MB scoped-VMEM limit — resident f32 n=64 19.47 MB, bf16-compute
    19.05 MB (peak is Mosaic staging, not payload dtype), sweep-streamed
    in/out-aliased f32 24.35 MB — and a 64-lane chunked variant compiles
    but runs at 0.61x the jnp Jacobi (half-lane occupancy), so the
    fallback stays jnp (BENCH_NOTES round 5).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, n2, B = A_bm.shape
    if n != n2:
        raise ValueError(f"expected [n, n, B], got {A_bm.shape}")
    tile, Bp, use_pallas = plan_tiles(n, B, tile, A_bm.dtype.itemsize)
    if not use_pallas:
        from ..linalg.jacobi import eigh_jacobi

        return eigh_jacobi(A_bm, sweeps=sweeps, sort=sort)

    # pad a non-divisible batch with identity lanes (well-conditioned, no
    # NaN risk) and slice the results back — the round-2..3 hard requirement
    # `B % tile == 0` becomes a padding cost of < one tile of lanes
    pad = Bp - B
    if pad:
        eye = jnp.broadcast_to(
            jnp.eye(n, dtype=A_bm.dtype)[:, :, None], (n, n, pad)
        )
        A_bm = jnp.concatenate([A_bm, eye], axis=-1)
    schedule = round_robin_schedule(n)
    kern = functools.partial(_kernel, n=n, sweeps=sweeps, schedule=schedule)
    w, V = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((n, Bp), A_bm.dtype),
            jax.ShapeDtypeStruct((n, n, Bp), A_bm.dtype),
        ),
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((n, n, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(A_bm)
    if pad:
        w, V = w[:, :B], V[:, :, :B]
    if sort:
        order = jnp.argsort(w, axis=0)
        w = jnp.take_along_axis(w, order, axis=0)
        V = jnp.take_along_axis(V, order[None], axis=1)
    return Eigh(eigenvalues=w, eigenvectors=V)
