"""Pallas batched QR: the Sameh-Kuck wavefront, VMEM-resident.

Same architecture as ``ops/eigh_jacobi.py`` (the kernel that beats XLA
44x): the batch rides the 128-lane axis, R (and optionally Q^T) stay in
VMEM across ALL m+2n-3 wavefront stages — one HBM read and one write per
element regardless of stage count, where the pure-jnp wavefront
(``linalg/qr_parallel.py``) re-materializes between XLA fusions.  All data
movement is static-slice concatenation (this Mosaic toolchain's rules:
no 1-D blocks, no gathers, one tiled axis per pallas_call — CLAUDE.md).

Schedule and semantics identical to ``linalg.qr_parallel``: rotation of
rows (i-1, i) zeroes entry (i, j) at stage m-1-i+2j; stages are
row-disjoint so each is a handful of whole-tile vectorized ops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..linalg.givens import givens_rotation
from ..linalg.qr_parallel import sameh_kuck_schedule
from .eigh_jacobi import plan_lane_tiles as _plan  # shared VMEM/lane planner


def _pad_lanes(X, pad):
    """Append ``pad`` zero lanes on the trailing axis (zeros are safe for
    the QR rotations: the stable givens_rotation maps (0, 0) -> identity,
    and the pad lanes are sliced away before returning)."""
    if not pad:
        return X
    return jnp.concatenate(
        [X, jnp.zeros(X.shape[:-1] + (pad,), X.dtype)], axis=-1
    )


def _stage(R, carried, ps, qs, js, perm, dtype):
    """One wavefront stage on the [m, n, T] tile (+ same row ops on every
    carried [m, *, T] tile)."""
    m = R.shape[0]
    T = R.shape[-1]
    a = jnp.concatenate(
        [R[p, j : j + 1] for p, j in zip(ps, js)], axis=0
    )                                                   # [k, T]
    b = jnp.concatenate(
        [R[q, j : j + 1] for q, j in zip(qs, js)], axis=0
    )
    c, s = givens_rotation(a, b)

    role = {}                     # row -> (pair index, sign of s)
    for i, (p, q) in enumerate(zip(ps, qs)):
        role[int(p)] = (i, 1.0)   # row p <- c R[p] + s R[q]
        role[int(q)] = (i, -1.0)  # row q <- -s R[p] + c R[q]
    ones = jnp.ones((1, T), dtype)
    zeros = jnp.zeros((1, T), dtype)
    crows, srows = [], []
    for r in range(m):
        if r in role:
            i, sign = role[r]
            crows.append(c[i : i + 1])
            srows.append(sign * s[i : i + 1])
        else:
            crows.append(ones)
            srows.append(zeros)
    Cv = jnp.concatenate(crows, axis=0)                  # [m, T]
    Sv = jnp.concatenate(srows, axis=0)

    def rot(X):
        Xp = jnp.stack([X[int(perm[r])] for r in range(m)], axis=0)
        return Cv[:, None] * X + Sv[:, None] * Xp

    return rot(R), [rot(X) for X in carried]


def _backsolve(R, b, n):
    """Unrolled back-substitution R[:n,:n] x = b[:n] on [.., 1, T] columns."""
    xs = [None] * n
    for i in range(n - 1, -1, -1):
        acc = b[i]
        for j in range(i + 1, n):
            acc = acc - R[i, j] * xs[j]
        xs[i] = acc / R[i, i]
    return jnp.stack(xs, axis=0)                         # [n, 1, T]


def _kernel(A_ref, *refs, m, n, schedule, compute_q, solve):
    dtype = A_ref.dtype
    R = A_ref[...]                                       # [m, n, T]
    T = R.shape[-1]
    carried = []
    if compute_q:
        carried.append(
            jnp.broadcast_to(jnp.eye(m, dtype=dtype)[:, :, None], (m, m, T))
        )
    if solve:
        y_ref, refs = refs[0], refs[1:]
        carried.append(y_ref[...])                       # [m, 1, T] rhs
    out_refs = refs
    for ps, qs, js, perm in schedule:
        R, carried = _stage(R, carried, ps, qs, js, perm, dtype)
    if solve:
        # x solves min ||A x - y||: R[:n,:n] x = (Q^T y)[:n], all in VMEM
        qty = carried[-1]
        out_refs[-1][...] = _backsolve(R, qty, n)
        out_refs = out_refs[:-1]
    if out_refs:
        out_refs[0][...] = R
    if compute_q:
        out_refs[1][...] = carried[0]                    # Q^T


@functools.partial(jax.jit, static_argnames=("compute_q", "tile", "interpret"))
def qr_wavefront_pallas(
    A_bm: jax.Array,                 # [m, n, B] batch-minor
    compute_q: bool = False,
    tile: int = 128,
    interpret: bool = False,
):
    """Batched QR of ``A_bm``; returns ``(R [m, n, B], Q [m, m, B] | None)``
    matching ``linalg.qr_parallel`` (same schedule, same rotations)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, n, B = A_bm.shape
    if m < n:
        raise ValueError(f"need m >= n, got {A_bm.shape}")
    resident = m * n + (m * m if compute_q else 0)
    tile, Bp, fits = _plan(B, tile, resident * A_bm.dtype.itemsize)
    if not fits:
        from ..linalg.qr_parallel import qr_parallel

        out = qr_parallel(A_bm, compute_q=compute_q)
        return out.R, out.Q
    A_bm = _pad_lanes(A_bm, Bp - B)
    schedule = sameh_kuck_schedule(m, n)
    kern = functools.partial(
        _kernel, m=m, n=n, schedule=schedule, compute_q=compute_q, solve=False
    )
    out_shape = [jax.ShapeDtypeStruct((m, n, Bp), A_bm.dtype)]
    out_specs = [
        pl.BlockSpec((m, n, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    ]
    if compute_q:
        out_shape.append(jax.ShapeDtypeStruct((m, m, Bp), A_bm.dtype))
        out_specs.append(
            pl.BlockSpec((m, m, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
        )
    outs = pl.pallas_call(
        kern,
        out_shape=tuple(out_shape),
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((m, n, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(A_bm)
    R = outs[0][..., :B]
    if compute_q:
        return R, jnp.swapaxes(outs[1][..., :B], 0, 1)
    return R, None


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def least_squares_wavefront_pallas(
    A_bm: jax.Array,                 # [m, n, B] batch-minor
    y_bm: jax.Array,                 # [m, B]
    tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """``min_x ||A x - y||`` per lane, entirely in VMEM: the rotations
    thread y through (implicit Q^T y) and the back-substitution runs inside
    the kernel — HBM traffic is one read of A/y and one write of x [n, B],
    no R materialization (vs ``linalg.least_squares_parallel`` which
    re-materializes R between XLA fusions; tinyqr.h:437-470's pipeline)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, n, B = A_bm.shape
    if m < n:
        raise ValueError(f"need m >= n, got {A_bm.shape}")
    if y_bm.shape != (m, B):
        raise ValueError(f"rhs must be [m, B]={m, B}, got {y_bm.shape}")
    tile, Bp, fits = _plan(B, tile, (m * n + m + n) * A_bm.dtype.itemsize)
    if not fits:
        from ..linalg.qr_parallel import least_squares_parallel

        return least_squares_parallel(A_bm, y_bm)
    pad = Bp - B
    if pad:
        # pad A with identity-like lanes (ones on a diagonal would also
        # work; zero A gives R=0 and the backsolve 0/0 -> nan in DEAD
        # lanes only, which are sliced away — use eye to keep them finite)
        eye = jnp.zeros((m, n, pad), A_bm.dtype)
        eye = eye.at[jnp.arange(n), jnp.arange(n), :].set(1.0)
        A_bm = jnp.concatenate([A_bm, eye], axis=-1)
        y_bm = jnp.concatenate(
            [y_bm, jnp.zeros((m, pad), y_bm.dtype)], axis=-1
        )
    schedule = sameh_kuck_schedule(m, n)
    kern = functools.partial(
        _kernel, m=m, n=n, schedule=schedule, compute_q=False, solve=True
    )
    x = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, 1, Bp), A_bm.dtype),
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((m, n, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, 1, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A_bm, y_bm[:, None, :])
    return x[:, 0, :B]
