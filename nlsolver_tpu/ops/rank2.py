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
