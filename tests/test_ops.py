"""Batched ops: numerical equivalence of jnp / batch-minor / Pallas
(interpret-mode on CPU) formulations."""
import jax
import jax.numpy as jnp
import pytest

from nlsolver_tpu.ops import (
    rank2_update_batched_jnp,
    rank2_update_batched_pallas,
    solve_spd_batched,
    solve_spd_batched_pallas,
)
from nlsolver_tpu.ops.rank2 import rank2_update_reference


def _spd_batch(key, B, n, dtype=jnp.float32):
    A = jax.random.normal(key, (B, n, n), dtype)
    return jnp.einsum("bij,bkj->bik", A, A) + 2 * jnp.eye(n, dtype=dtype)


def test_rank2_jnp_matches_per_instance(key):
    B, n = 32, 8
    k1, k2, k3, k4 = jax.random.split(key, 4)
    H = _spd_batch(k1, B, n, jnp.float64)
    s = jax.random.normal(k2, (B, n), jnp.float64)
    y = jax.random.normal(k3, (B, n), jnp.float64)
    rho = 1.0 / jnp.einsum("bi,bi->b", y, s)
    batched = rank2_update_batched_jnp(H, s, y, rho)
    per = jax.vmap(rank2_update_reference)(H, s, y, rho)
    assert jnp.allclose(batched, per, atol=1e-10)


def test_rank2_pallas_interpret_matches(key):
    B, n = 64, 8
    k1, k2, k3 = jax.random.split(key, 3)
    H = _spd_batch(k1, B, n, jnp.float32)
    s = jax.random.normal(k2, (B, n), jnp.float32)
    y = jax.random.normal(k3, (B, n), jnp.float32)
    rho = 1.0 / jnp.einsum("bi,bi->b", y, s)
    ref = rank2_update_batched_jnp(H, s, y, rho)
    out = rank2_update_batched_pallas(H, s, y, rho, tile=32, interpret=True)
    assert jnp.allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_solve_spd_batched(key):
    B, n = 128, 6
    k1, k2 = jax.random.split(key)
    A = _spd_batch(k1, B, n, jnp.float64)
    b = jax.random.normal(k2, (B, n), jnp.float64)
    x = solve_spd_batched(A, b)
    assert jnp.allclose(jnp.einsum("bij,bj->bi", A, x), b, atol=1e-8)


def test_solve_spd_pallas_interpret(key):
    B, n = 128, 4
    k1, k2 = jax.random.split(key)
    A = _spd_batch(k1, B, n, jnp.float32)
    b = jax.random.normal(k2, (B, n), jnp.float32)
    ref = solve_spd_batched(A, b)
    out = solve_spd_batched_pallas(A, b, tile=128, interpret=True)
    assert jnp.allclose(out, ref, atol=1e-4, rtol=1e-4)
