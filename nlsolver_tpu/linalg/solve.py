"""Triangular / Cholesky / least-squares solves.

Re-creation of the reference's dense-solve helpers:
  * ``cholesky`` + ``forwardsolve``/``backsolve`` (nlsolver.h:252-294);
  * ``get_update_with_hessian`` — LM's damped-normal-equation solve with a
    diagonal fast path (nlsolver.h:310-330); on TPU one Cholesky solve
    covers both branches;
  * tinyqr's ``back_solve`` / ``lm`` least-squares (tinyqr.h:437-470).

All functions are pure jnp on single matrices; batch with ``vmap`` (used by
the batched-LM / NLLS paths), or swap in the Pallas batched kernels from
``nlsolver_tpu.ops`` for small-matrix fleets.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def cholesky(A: jax.Array) -> jax.Array:
    """Lower-triangular Cholesky factor (nlsolver.h:252-270)."""
    return jnp.linalg.cholesky(A)


def forwardsolve(L: jax.Array, b: jax.Array) -> jax.Array:
    return jsl.solve_triangular(L, b, lower=True)


def backsolve(U: jax.Array, b: jax.Array) -> jax.Array:
    return jsl.solve_triangular(U, b, lower=False)


def solve_cholesky(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve SPD A x = b via Cholesky (the reference's LM solve path,
    nlsolver.h:326-329)."""
    c, low = jsl.cho_factor(A)
    return jsl.cho_solve((c, low), b)


def damped_solve(H: jax.Array, g: jax.Array, lam) -> jax.Array:
    """(H + lam I) u = g (get_update_with_hessian + H += lam I,
    nlsolver.h:3529-3533)."""
    n = g.shape[-1]
    return solve_cholesky(H + lam * jnp.eye(n, dtype=H.dtype), g)


def least_squares(A: jax.Array, y: jax.Array) -> jax.Array:
    """Minimize ||A x - y||_2 via QR (tinyqr's ``lm``, tinyqr.h:460-470)."""
    q, r = jnp.linalg.qr(A)
    return jsl.solve_triangular(r, q.T @ y, lower=False)
