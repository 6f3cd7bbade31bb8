"""Shared test helpers: cached jitted solver entry points.

Eager-mode solves re-trace the while_loop body every call; jitting makes the
suite ~1000x faster and exercises the intended usage path.
"""
from functools import cache

import jax
import jax.numpy as jnp


@cache
def jitted_minimize(mod, fn, cfg):
    return jax.jit(lambda x0, key: mod.minimize(fn, x0, cfg, key=key))


def solve(mod, fn, x0, cfg, key=None):
    if key is None:
        key = jax.random.key(0)
    return jitted_minimize(mod, fn, cfg)(x0, key)


def start_point(p, dtype=jnp.float64):
    """Reference test harness start point x0 = (-0.5, ...) (test_functions.h:395)."""
    return jnp.full((p.dim,), -0.5, dtype=dtype)
