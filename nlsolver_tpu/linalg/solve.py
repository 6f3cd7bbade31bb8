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


# Below this order, an unrolled scalar Cholesky beats LAPACK-shaped
# cho_solve by a wide margin once vmapped: the unrolled graph is pure
# elementwise ops over the batch (measured on v5e: a vmapped [4096, 2, 2]
# cho_solve costs ~1 ms per call inside a solver loop — the entire LM fleet
# per-iteration budget — vs ~30 us unrolled; see ops/smallchol.py for the
# same idea in batch-minor layout).
_UNROLL_N = 8


def _solve_spd_unrolled(A: jax.Array, b: jax.Array) -> jax.Array:
    """Single small SPD solve, fully unrolled over the static order n.

    Scalar indexing only, so under ``vmap`` every operation becomes a
    [B]-shaped elementwise op — no batched-LAPACK path, no transposes."""
    n = b.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def damped_solve(H: jax.Array, g: jax.Array, lam) -> jax.Array:
    """(H + lam I) u = g (get_update_with_hessian + H += lam I,
    nlsolver.h:3529-3533).  Small orders use the unrolled vmap-friendly
    solve (see _UNROLL_N note)."""
    n = g.shape[-1]
    Hd = H + lam * jnp.eye(n, dtype=H.dtype)
    if n <= _UNROLL_N:
        return _solve_spd_unrolled(Hd, g)
    return solve_cholesky(Hd, g)


def least_squares(A: jax.Array, y: jax.Array) -> jax.Array:
    """Minimize ||A x - y||_2 via QR (tinyqr's ``lm``, tinyqr.h:460-470)."""
    q, r = jnp.linalg.qr(A)
    return jsl.solve_triangular(r, q.T @ y, lower=False)
