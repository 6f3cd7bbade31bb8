"""Batched BFGS rank-2 inverse-Hessian update.

The reference's O(n^2) scalar loop (``update_inverse_hessian``,
nlsolver.h:3130-3168, fed by ``hessian_update_inner_loop`` nlsolver.h:232)
becomes a fused batched tensor contraction: for B problem instances at once

    H'_b = H_b - rho_b (s_b (y_b^T H_b) + (H_b y_b) s_b^T)
               + rho_b (1 + rho_b y_b^T H_b y_b) s_b s_b^T

`rank2_update_batched` is the public API; `use_pallas=True` runs the Pallas
TPU kernel (grid over instance tiles, whole [TB, n, n] blocks in VMEM, all
contractions on the VPU), otherwise a fused jnp einsum formulation that XLA
compiles to essentially the same thing.  Numerical equivalence is tested in
tests/test_ops.py; bench_ops.py measures both on hardware.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def rank2_update_reference(H, s, y, rho):
    """Single-instance update (solvers.bfgs.rank2_update formulation)."""
    Hy = H @ y
    yHy = jnp.dot(y, Hy)
    coef = rho * (1.0 + rho * yHy)
    sym = jnp.outer(s, Hy) + jnp.outer(Hy, s)
    return H - rho * sym + coef * jnp.outer(s, s)


def rank2_update_batched_jnp(H, s, y, rho):
    """Fused batched formulation: [B, n, n], [B, n], [B, n], [B]."""
    Hy = jnp.einsum("bij,bj->bi", H, y)
    yHy = jnp.einsum("bi,bi->b", y, Hy)
    coef = rho * (1.0 + rho * yHy)
    sym = jnp.einsum("bi,bj->bij", s, Hy) + jnp.einsum("bi,bj->bij", Hy, s)
    ss = jnp.einsum("bi,bj->bij", s, s)
    return H - rho[:, None, None] * sym + coef[:, None, None] * ss


def _kernel(H_ref, s_ref, y_ref, rho_ref, out_ref):
    H = H_ref[...]          # [TB, n, n]
    s = s_ref[...]          # [TB, n]
    y = y_ref[...]
    rho = rho_ref[...][:, 0]  # [TB, 1] -> [TB] (1-D blocks break Mosaic)
    Hy = jnp.sum(H * y[:, None, :], axis=2)          # [TB, n]
    yHy = jnp.sum(y * Hy, axis=1)                    # [TB]
    coef = (rho * (1.0 + rho * yHy))[:, None, None]
    r = rho[:, None, None]
    sym = s[:, :, None] * Hy[:, None, :] + Hy[:, :, None] * s[:, None, :]
    out_ref[...] = H - r * sym + coef * (s[:, :, None] * s[:, None, :])


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def rank2_update_batched_pallas(H, s, y, rho, tile: int = 256, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = H.shape
    tile = min(tile, B)
    if B % tile:
        raise ValueError(f"batch {B} must be divisible by tile {tile}")
    grid = (B // tile,)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(H.shape, H.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(H, s, y, rho[:, None])


def rank2_update_batched(H, s, y, rho, use_pallas: bool = False, **kw):
    if use_pallas:
        return rank2_update_batched_pallas(H, s, y, rho, **kw)
    return rank2_update_batched_jnp(H, s, y, rho)


# ---------------------------------------------------------------------------
# Batch-minor ([n, n, B]) fused update + next-direction kernel.
#
# The [TB, n, n] layout above wastes lanes when n << 128; putting the FLEET
# on the trailing (lane) axis makes every contraction a full-width VPU op
# regardless of n, and fusing the next search direction d' = -H' g into the
# same pass reads the O(n^2 B) tensor once instead of twice per BFGS
# iteration.  ``reset`` lanes (curvature loss / NaN — the reference's
# self-healing H=I, nlsolver.h:3253-3260) substitute the identity for H
# *inside* the kernel, so deferred resets cost no extra memory pass.
# ---------------------------------------------------------------------------


def rank2_direction_batchminor_jnp(H, s, y, g, rho, reset):
    """[n, n, B] reference formulation: returns (H', d' = -H' g).

    H [n,n,B]; s, y, g [n,B]; rho, reset [B] (reset: bool — use identity
    in place of H before updating).
    """
    n = H.shape[0]
    eye = jnp.eye(n, dtype=H.dtype)[:, :, None]
    Heff = jnp.where(reset[None, None, :], eye, H)
    Hy = jnp.sum(Heff * y[None, :, :], axis=1)             # [n,B]
    yHy = jnp.sum(y * Hy, axis=0)                          # [B]
    coef = rho * (1.0 + rho * yHy)
    sym = s[:, None, :] * Hy[None, :, :] + Hy[:, None, :] * s[None, :, :]
    Hn = Heff - rho[None, None, :] * sym + coef[None, None, :] * (
        s[:, None, :] * s[None, :, :]
    )
    d = -jnp.sum(Hn * g[None, :, :], axis=1)               # [n,B]
    return Hn, d


def _bm_kernel(H_ref, s_ref, y_ref, g_ref, rho_ref, reset_ref, Hout_ref, dout_ref):
    H = H_ref[...]              # [n, n, TB]
    s = s_ref[...]              # [n, TB]
    y = y_ref[...]
    g = g_ref[...]
    rho = rho_ref[...]          # [1, TB]
    reset = reset_ref[...] > 0  # [1, TB]
    n = H.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (row == col).astype(H.dtype)[:, :, None]
    Heff = jnp.where(reset[None, :, :], eye, H)
    Hy = jnp.sum(Heff * y[None, :, :], axis=1)             # [n, TB]
    yHy = jnp.sum(y * Hy, axis=0, keepdims=True)           # [1, TB]
    coef = (rho * (1.0 + rho * yHy))[None, :, :]           # [1, 1, TB]
    r = rho[None, :, :]
    sym = s[:, None, :] * Hy[None, :, :] + Hy[:, None, :] * s[None, :, :]
    Hn = Heff - r * sym + coef * (s[:, None, :] * s[None, :, :])
    Hout_ref[...] = Hn
    dout_ref[...] = -jnp.sum(Hn * g[None, :, :], axis=1)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def rank2_direction_batchminor_pallas(
    H, s, y, g, rho, reset, tile: int = 512, interpret: bool = False
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, _, B = H.shape
    # keep the [n, n, tile] block (x6 for in/out/temps) inside VMEM
    while tile > 128 and n * n * tile * 4 * 6 > 12 * 2**20:
        tile //= 2
    if n * n * tile * 4 * 6 > 12 * 2**20:
        raise ValueError(
            f"n={n} needs a [n, n, 128] block > VMEM; use the jnp path "
            "(it is faster than this kernel for large n anyway — BENCH_NOTES.md)"
        )
    tile = min(tile, B)
    pad = (-B) % tile
    if pad:
        zpad3 = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, pad)))
        zpad2 = lambda a: jnp.pad(a, ((0, 0), (0, pad)))
        H, s, y, g = zpad3(H), zpad2(s), zpad2(y), zpad2(g)
        rho = jnp.pad(rho, (0, pad))
        reset = jnp.pad(reset, (0, pad))
    Bp = B + pad
    grid = (Bp // tile,)
    vec = lambda: pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    lane = lambda: pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    Hn, d = pl.pallas_call(
        _bm_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, n, Bp), H.dtype),
            jax.ShapeDtypeStruct((n, Bp), H.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            vec(), vec(), vec(), lane(), lane(),
        ],
        out_specs=(
            pl.BlockSpec((n, n, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            vec(),
        ),
        interpret=interpret,
    )(H, s, y, g, rho[None, :], reset.astype(jnp.int32)[None, :])
    if pad:
        return Hn[:, :, :B], d[:, :B]
    return Hn, d


def rank2_direction_batchminor(H, s, y, g, rho, reset, use_pallas=False, **kw):
    if use_pallas:
        return rank2_direction_batchminor_pallas(H, s, y, g, rho, reset, **kw)
    return rank2_direction_batchminor_jnp(H, s, y, g, rho, reset)
