"""Objective-function handling.

The reference takes a stateful C++ functor by reference and wraps it in a
counting lambda with a compile-time sign (``f_multiplier``; nlsolver.h:
2177-2182).  Here an objective is any pure callable ``f(x: Array[n]) ->
scalar``; maximization is minimization of ``-f`` (README.md:139-140), batched
evaluation is ``vmap``, and evaluation counts live explicitly in solver state
(no hidden mutation — required for jit purity).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

Objective = Callable[[jax.Array], jax.Array]


@dataclass(frozen=True)
class Bounds:
    """Box bounds. Arrays broadcastable against x."""

    lower: jax.Array
    upper: jax.Array


def signed(fn: Objective, minimize: bool) -> Objective:
    """Sign-wrap: maximization == minimization of -f."""
    if minimize:
        return fn
    return lambda x: -fn(x)


def batch_eval(fn: Objective, xs: jax.Array) -> jax.Array:
    """Evaluate fn over a batch of points [B, n] -> [B].

    This is the TPU replacement for every sequential agent/vertex scoring
    loop in the reference (e.g. DE nlsolver.h:2423-2425, NM :2184-2186):
    one vmapped call XLA can fuse and tile.
    """
    return jax.vmap(fn)(xs)


def resolve_bounds(
    bounds: Optional[Bounds], x0: jax.Array
) -> tuple[jax.Array, jax.Array, bool]:
    """Return (lower, upper, bounded)."""
    if bounds is None:
        big = jnp.asarray(jnp.inf, x0.dtype)
        return (
            jnp.full_like(x0, -big),
            jnp.full_like(x0, big),
            False,
        )
    lower = jnp.broadcast_to(jnp.asarray(bounds.lower, x0.dtype), x0.shape)
    upper = jnp.broadcast_to(jnp.asarray(bounds.upper, x0.dtype), x0.shape)
    return lower, upper, True
