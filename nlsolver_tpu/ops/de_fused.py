"""Fully-fused DE generation as one Pallas TPU kernel.

One kernel per generation: mutation (ring-rotation partners), binomial
crossover with in-kernel PRNG (``pltpu.prng_random_bits``), column-wise
objective evaluation (the user's jnp-traceable ``fn`` is traced INTO the
kernel body), and greedy selection — every intermediate lives in VMEM, so
per-generation HBM traffic is exactly one read + one write of the agent
matrix and scores (the streaming minimum).

This is the SURVEY.md §2 "fused DE mutation+crossover+select" Pallas
deliverable.  Layout matches ``solvers.de_batched``: agents [B, n, P]
(population on lanes), rotation partner sampling.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _uniform_from_bits(bits):
    # uint32 -> [0, 1) float32 without an int->float cast (unsupported in
    # Mosaic): pack 23 random mantissa bits under exponent 0 -> [1, 2),
    # subtract 1
    from jax.experimental.pallas import tpu as pltpu

    mantissa = (bits >> 9) | jnp.uint32(0x3F800000)
    return pltpu.bitcast(mantissa, jnp.float32) - 1.0


def _make_kernel(fn, n: int, P: int, cross_prob: float, diff_weight: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seed_ref, offs_ref, agents_ref, scores_ref, out_agents_ref, out_scores_ref):
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        A = agents_ref[...]          # [TB, n, P]
        s = scores_ref[...]          # [TB, P]
        o1 = offs_ref[0, 0]
        o2 = offs_ref[0, 1]
        o3 = offs_ref[0, 2]

        # ring partners via a combined circulant selection matrix
        # (dynamic-shift rolls fail to compile on this Mosaic toolchain, so
        # the rotation is expressed as one small in-VMEM matmul on the MXU):
        # S[t, s] = [s == t+o1] + F([s == t+o2] - [s == t+o3])  (mod P)
        rows = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
        perm = lambda o: (cols == (rows + o) % P).astype(A.dtype)
        S = perm(o1) + diff_weight * (perm(o2) - perm(o3))    # [P_tgt, P_src]
        TB = A.shape[0]
        donor = jax.lax.dot_general(
            A.reshape(TB * n, P), S,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=A.dtype,
        ).reshape(TB, n, P)

        u = _uniform_from_bits(
            pltpu.bitcast(pltpu.prng_random_bits(A.shape), jnp.uint32)
        )
        # forced dimension per particle: uniform int in [0, n)
        fbits = pltpu.bitcast(
            pltpu.prng_random_bits((A.shape[0], P)), jnp.int32
        )
        fdim = (fbits & jnp.int32(0x7FFFFFFF)) % jnp.int32(n)  # [TB, P]
        dims = jax.lax.broadcasted_iota(jnp.int32, A.shape, 1)  # n axis
        mutate = (u < cross_prob) | (dims == fdim[:, None, :])
        prop = jnp.where(mutate, donor, A)

        # column-wise objective evaluation, traced into the kernel
        prop_scores = jax.vmap(jax.vmap(fn, in_axes=1))(prop)   # [TB, P]

        accept = prop_scores < s
        out_agents_ref[...] = jnp.where(accept[:, None, :], prop, A)
        out_scores_ref[...] = jnp.where(accept, prop_scores, s)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("fn", "cross_prob", "diff_weight", "tile", "interpret")
)
def de_generation_fused(
    fn,
    agents,             # [B, n, P] f32
    scores,             # [B, P] f32
    seed,               # int32 scalar (vary per generation)
    offs,               # [3] int32 ring offsets (distinct, nonzero)
    cross_prob: float = 0.9,
    diff_weight: float = 0.8,
    tile: int = 256,
    interpret: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, P = agents.shape
    tile = min(tile, B)
    # scoped VMEM is 16 MB; the kernel's working set is ~6x the agent
    # block (A, donor, u, prop, out + the [P, P] selection matmul temps)
    while tile > 8 and tile * n * P * 4 * 6 > 12 * 2**20:
        tile //= 2
    if B % tile:
        raise ValueError(f"batch {B} must divide by tile {tile}")
    kernel = _make_kernel(fn, n, P, cross_prob, diff_weight)
    grid = (B // tile,)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    offs_arr = jnp.asarray(offs, jnp.int32).reshape(1, 3)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(agents.shape, agents.dtype),
            jax.ShapeDtypeStruct(scores.shape, scores.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, n, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, n, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(seed_arr, offs_arr, agents, scores)


# Measured on one v5e chip (B=2048, pop=64, dim=10, rastrigin): 447 us per
# generation vs 345 us for the XLA-fused rotation path in
# solvers/de_batched.py -- XLA's automatic fusion of the lane-roll variant
# already keeps intermediates in registers/VMEM, and the in-kernel circulant
# matmul (P padded to 128 MXU lanes) costs more than lane rolls.  The kernel
# remains useful as the template for objectives XLA fails to fuse (it
# guarantees one HBM read + one write per generation) and for larger
# populations where the matmul amortizes.
