"""Bit-parity std::mt19937 + libstdc++ uniform_real_distribution<double>.

The reference's test harness demonstrates user-RNG interop by wrapping
``std::mt19937`` in a U[0,1) functor (test_functions.h:40-48) and handing
it to any solver.  This is the same generator as a pure JAX state machine,
registered through the ``reference_rngs.register`` hook (``register_mt()``)
so the emulation solvers accept ``rng="mt"`` — and the golden-trajectory
suite replays a real mt19937-driven reference DE run draw-for-draw
(tests/data/reference_trajectories.tsv, de_rand_mt rows).

Semantics reproduced exactly:

  * MT19937 (Matsumoto & Nishimura 1998): 624-word state, the standard
    init_genrand seeding ``mt[i] = 1812433253*(mt[i-1]^(mt[i-1]>>30))+i``
    (= the C++ ``mt19937(seed)`` ctor), tempering, and the 397-offset
    twist.  The twist is vectorized into three dependency-ordered chunks
    ([0,227), [227,454), [454,624)) instead of the scalar loop — new[i]
    depends on new[i-227] only across chunk boundaries.
  * libstdc++ ``generate_canonical<double, 53>`` (bits/random.tcc:3352,
    gcc 12): TWO 32-bit draws per variate, low word first,
    ``(x0 + x1*2^32) / 2^64`` accumulated in f64, clamped to
    ``nextafter(1, 0)`` if the rounded sum reaches 1.0 — verified
    bit-equal against a compiled probe (seed 42, first 10^5 draws,
    tests/test_reference_rngs.py).

Requires f64 (the distribution itself is double); the emitted variate is
cast to the requested dtype afterwards, like the other reference RNGs.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N = 624
M = 397
UPPER = np.uint32(0x80000000)
LOWER = np.uint32(0x7FFFFFFF)
MATRIX_A = np.uint32(0x9908B0DF)
_ONE_MINUS = float(np.nextafter(1.0, 0.0))


class MTState(NamedTuple):
    mt: jax.Array     # [624] uint32
    idx: jax.Array    # () int32, 0..624 (624 => twist before next draw)
    dt: jax.Array     # () zero of the requested OUTPUT dtype (dtype marker)


def seed_table(seed: int = 42) -> np.ndarray:
    """C++ mt19937(seed) ctor == init_genrand (computed host-side once)."""
    mt = np.empty(N, np.uint32)
    mt[0] = np.uint32(seed)
    with np.errstate(over="ignore"):    # uint32 wraparound is the algorithm
        for i in range(1, N):
            prev = mt[i - 1]
            mt[i] = (np.uint32(1812433253) * (prev ^ (prev >> np.uint32(30)))
                     + np.uint32(i))
    return mt


def init(seed: int = 42, dtype=jnp.float64) -> MTState:
    return MTState(
        mt=jnp.asarray(seed_table(seed)),
        idx=jnp.int32(N),
        dt=jnp.zeros((), dtype),
    )


def _twist(mt: jax.Array) -> jax.Array:
    def mix(cur, nxt, far):
        y = (cur & UPPER) | (nxt & LOWER)
        return far ^ (y >> np.uint32(1)) ^ ((y & np.uint32(1)) * MATRIX_A)

    a = mix(mt[0:227], mt[1:228], mt[397:624])          # new[0:227]
    b = mix(mt[227:454], mt[228:455], a[0:227])         # new[227:454]
    c = mix(mt[454:623], mt[455:624], b[0:169])         # new[454:623]
    last = mix(mt[623:624], a[0:1], b[169:170])         # new[623] wraps to new[0]
    return jnp.concatenate([a, b, c, last])


def next_u32(state: MTState) -> Tuple[jax.Array, MTState]:
    mt, idx = lax.cond(
        state.idx >= N,
        lambda s: (_twist(s.mt), jnp.int32(0)),
        lambda s: (s.mt, s.idx),
        state,
    )
    y = mt[idx]
    y = y ^ (y >> np.uint32(11))
    y = y ^ ((y << np.uint32(7)) & np.uint32(0x9D2C5680))
    y = y ^ ((y << np.uint32(15)) & np.uint32(0xEFC60000))
    y = y ^ (y >> np.uint32(18))
    return y, MTState(mt=mt, idx=idx + 1, dt=state.dt)


def next_canonical(state: MTState) -> Tuple[jax.Array, MTState]:
    """One uniform_real_distribution<double>(0,1) draw (two raw words),
    emitted in the state's requested dtype (the canonical arithmetic runs
    in f64 — the distribution itself is double; bit-parity therefore needs
    jax_enable_x64)."""
    x0, state = next_u32(state)
    x1, state = next_u32(state)
    u = (x0.astype(jnp.float64)
         + x1.astype(jnp.float64) * jnp.float64(4294967296.0)) / jnp.float64(
             18446744073709551616.0)
    u = jnp.where(u >= 1.0, jnp.float64(_ONE_MINUS), u)
    return u.astype(state.dt.dtype), state


def register_mt(kind: str = "mt", seed: int = 42) -> None:
    """Expose mt19937 through the user-generator hook so the emulation
    solvers accept ``rng=kind`` (the reference harness's interop pattern).
    The solver's requested dtype is honored (carried in the state's dtype
    marker); the canonical arithmetic itself is f64, so bit-parity with
    libstdc++ requires jax_enable_x64."""
    from . import reference_rngs

    reference_rngs.register(
        kind,
        lambda dtype: init(seed, dtype=dtype),
        next_canonical,
    )
