"""Finite-difference derivatives with the reference's stencils.

Re-creation of ``nlsolver::finite_difference`` (nlsolver.h:1383-1518).  On
TPU the default derivative path is autodiff (``jax.grad``/``jax.hessian``);
these stencils exist for parity testing and for objectives that are
jax-traceable but whose analytic gradients the user wants to avoid trusting.

Unlike the reference's per-dimension scalar loops, all stencil points are
built as one ``[n_evals, n]`` perturbation batch and scored with a single
vmapped call — the natural TPU formulation.

Gradient accuracy a in {0,1,2,3} uses the 2/4/6/8-point central stencils
with coefficient tables from nlsolver.h:1390-1398 and
eps = machine_eps * 1e8 (nlsolver.h:1389).
Hessian accuracy 0 is the 4-eval cross stencil (nlsolver.h:1422-1446);
accuracy >= 1 is the 16-eval high-order stencil with /(600 eps^2)
denominator (nlsolver.h:1447-1516); eps = machine_eps^0.25
(nlsolver.h:1417-1419).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

# central-difference stencils per accuracy level (nlsolver.h:1390-1395):
# (offsets in units of eps, weights, denominator multiple of eps)
_GRAD_STENCILS = {
    0: ((1.0, -1.0), (1.0, -1.0), 2.0),
    1: ((1.0, -8.0, 8.0, -1.0), (-2.0, -1.0, 1.0, 2.0), 12.0),
    2: ((-1.0, 9.0, -45.0, 45.0, -9.0, 1.0), (-3.0, -2.0, -1.0, 1.0, 2.0, 3.0), 60.0),
    3: (
        (3.0, -32.0, 168.0, -672.0, 672.0, -168.0, 32.0, -3.0),
        (-4.0, -3.0, -2.0, -1.0, 1.0, 2.0, 3.0, 4.0),
        840.0,
    ),
}

# 16-point hessian stencil (accuracy >= 1, nlsolver.h:1447-1516):
# weight, i-offset, j-offset; denominator 600 eps^2
_HESS_STENCIL_HI = (
    (-63.0, 1.0, -2.0),
    (-63.0, 2.0, -1.0),
    (-63.0, -2.0, 1.0),
    (-63.0, -1.0, 2.0),
    (63.0, -1.0, -2.0),
    (63.0, -2.0, -1.0),
    (63.0, 1.0, 2.0),
    (63.0, 2.0, 1.0),
    (44.0, 2.0, -2.0),
    (44.0, -2.0, 2.0),
    (-44.0, -2.0, -2.0),
    (-44.0, 2.0, 2.0),
    (74.0, -1.0, -1.0),
    (74.0, 1.0, 1.0),
    (-74.0, 1.0, -1.0),
    (-74.0, -1.0, 1.0),
)


@dataclass(frozen=True)
class FDConfig:
    accuracy: int = 1  # the solvers' fin_diff adapters use accuracy=1 (:2848-2863)


def _grad_eps(dtype) -> float:
    return float(jnp.finfo(dtype).eps) * 1e8


def _hess_eps(dtype) -> float:
    return float(jnp.finfo(dtype).eps) ** 0.25


def fd_gradient_cost(n: int, accuracy: int = 1) -> int:
    """Objective evaluations one gradient costs (for counter parity)."""
    return n * 2 * (accuracy + 1)


def fd_hessian_cost(n: int, accuracy: int = 1) -> int:
    return n * n * (4 if accuracy == 0 else 16)


def fd_gradient(fn, x: jax.Array, accuracy: int = 1) -> jax.Array:
    """Central-difference gradient, one batched evaluation."""
    coeffs, offsets, dd = _GRAD_STENCILS[accuracy]
    n = x.shape[-1]
    eps = jnp.asarray(_grad_eps(x.dtype), x.dtype)
    offs = jnp.asarray(offsets, x.dtype) * eps          # [s]
    w = jnp.asarray(coeffs, x.dtype)                    # [s]
    eye = jnp.eye(n, dtype=x.dtype)
    # [n, s, n] perturbed points: x + off_s * e_d
    pts = x[None, None, :] + offs[None, :, None] * eye[:, None, :]
    vals = jax.vmap(jax.vmap(fn))(pts)                  # [n, s]
    return (vals @ w) / (dd * eps)


def fd_hessian(fn, x: jax.Array, accuracy: int = 1) -> jax.Array:
    """Finite-difference Hessian, one batched evaluation of all entries."""
    n = x.shape[-1]
    eps = jnp.asarray(_hess_eps(x.dtype), x.dtype)
    eye = jnp.eye(n, dtype=x.dtype)
    if accuracy == 0:
        # 4-eval cross stencil (nlsolver.h:1427-1445):
        # (f(x) + f(x+ei+ej) - f(x+ei) - f(x+ej)) / eps^2  -- note the
        # reference evaluates f(x) fresh per entry; value identical
        stencil = ((1.0, 0.0, 0.0), (1.0, 1.0, 1.0), (-1.0, 1.0, 0.0), (-1.0, 0.0, 1.0))
        denom = eps * eps
    else:
        stencil = _HESS_STENCIL_HI
        denom = 600.0 * eps * eps
    w = jnp.asarray([s[0] for s in stencil], x.dtype)       # [k]
    oi = jnp.asarray([s[1] for s in stencil], x.dtype)      # [k]
    oj = jnp.asarray([s[2] for s in stencil], x.dtype)      # [k]
    # [n, n, k, n] points: x + oi*eps*e_i + oj*eps*e_j
    pts = (
        x[None, None, None, :]
        + eps * oi[None, None, :, None] * eye[:, None, None, :]
        + eps * oj[None, None, :, None] * eye[None, :, None, :]
    )  # [n, n, k, n]
    vals = jax.vmap(jax.vmap(jax.vmap(fn)))(pts)            # [n, n, k]
    return (vals @ w) / denom
