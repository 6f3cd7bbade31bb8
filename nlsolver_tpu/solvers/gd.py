"""Gradient descent with five stepping strategies.

Re-creation of the reference's ``GradientDescent`` (nlsolver.h:2816-3035):
step types Linesearch (More-Thuente), Fixed, Bigstep (the 248-entry
"long steps" pattern table from Grimmer, arXiv:2307.06324; reference table
at nlsolver.h:2875-2899), Anneal (alpha / (1 + iter/max_iter),
nlsolver.h:2997) and PAGE (probabilistic gradient-correction,
nlsolver.h:3018-3031).

Differences from the reference (deliberate):
  * the default derivative is ``jax.grad`` instead of a 4n-evaluation
    finite-difference stencil (FD remains available via Deriv(mode="fd"));
  * PAGE's switch probability p = b/(b'+b) is computed in real arithmetic —
    the reference divides two size_t's so p is always 0 (nlsolver.h:2944)
    and the correction branch always fires;
  * maximization is handled by objective negation rather than a sign
    multiplier threaded through the update (README.md:139-140 semantics are
    identical).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import Bounds, Objective, SolverResult, drive, make_result, signed
from ..deriv import Deriv, make_grad
from ..linesearch import more_thuente

# "long steps" periodic step-size patterns (Grimmer, arXiv:2307.06324),
# laid out exactly as the reference's fixed_steps table (nlsolver.h:2875-2899):
# level -> (offset, length) into the flat table (nlsolver.h:2825-2847)
_T = 1.4
BIGSTEP_TABLE = (
    # level 1 (len 2)
    2.9, 1.5,
    # level 2 (len 3)
    1.5, 4.9, 1.5,
    # level 3 (len 7)
    1.5, 2.2, 1.5, 12.0, 1.5, 2.2, 1.5,
    # level 4 (len 15)
    1.4, 2.0, 1.4, 4.5, 1.4, 2.0, 1.4, 29.7, 1.4, 2.0, 1.4, 4.5, 1.4, 2.0, 1.4,
    # level 5 (len 31)
    1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4, 8.2, 1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4,
    72.3,
    1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4, 8.2, 1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4,
    # level 6 (len 63)
    1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4, 7.2, 1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4,
    14.2,
    1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4, 7.2, 1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4,
    164.0,
    1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4, 7.2, 1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4,
    14.2,
    1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4, 7.2, 1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4,
    # level 7 (len 127)
    1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4, 7.2, 1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4,
    12.6,
    1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4, 7.2, 1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4,
    23.5,
    1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4, 7.2, 1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4,
    12.6,
    1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4, 7.2, 1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4,
    370.0,
    1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4, 7.2, 1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4,
    12.6,
    1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4, 7.2, 1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4,
    23.5,
    1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4, 7.5, 1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4,
    12.6,
    1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4, 7.2, 1.4, 2.0, 1.4, 3.9, 1.4, 2.0, 1.4,
)
BIGSTEP_OFFSETS = {1: (0, 2), 2: (2, 3), 3: (5, 7), 4: (12, 15), 5: (27, 31), 6: (58, 63), 7: (121, 127)}
assert len(BIGSTEP_TABLE) == 248


@dataclass(frozen=True)
class GDConfig:
    """Defaults from nlsolver.h:2903-2916."""

    step_type: str = "fixed"   # linesearch | fixed | bigstep | anneal | page
    alpha: float = 1.0
    max_iter: int = 500
    grad_eps: float = 1e-12
    minibatch: int = 128          # PAGE b
    minibatch_prime: int = 11     # PAGE b'
    bigstep_level: int = 5
    lipschitz_scaling: bool = True  # bigstep: divide step by max grad norm seen
    deriv: Deriv = field(default_factory=Deriv)
    # "default": correct gradient descent.  "reference": trajectory parity
    # with two reference quirks (verified in tests/test_trajectory_parity.py):
    #   * for step types that do not recompute the step size each iteration
    #     (fixed, page), `alpha_ *= f_multiplier` (nlsolver.h:3014) compounds
    #     across iterations, so minimization ALTERNATES descent (even
    #     iterations, 0-based) and ascent (odd iterations);
    #   * PAGE's switch probability p = minibatch/(minibatch'+minibatch) is
    #     size_t integer division (nlsolver.h:2944-2945) = 0, so the
    #     gradient correction branch is taken every iteration.
    # "safeguarded" (anneal only): divide the annealed step by the largest
    # gradient norm seen (shrink-only), preventing the schedule's
    # divergence on curved problems; reference semantics stay the default.
    variant: str = "default"


class GDState(NamedTuple):
    x: jax.Array
    gradient: jax.Array
    prev_gradient: jax.Array
    iteration: jax.Array
    nfev: jax.Array
    gfev: jax.Array
    max_grad_norm: jax.Array
    key: jax.Array
    done: jax.Array
    converged: jax.Array


def init(fn: Objective, x0: jax.Array, config: GDConfig, key: jax.Array) -> GDState:
    grad_fn, g_cost = make_grad(fn, x0.shape[-1], config.deriv)
    g = grad_fn(x0)
    return GDState(
        x=x0,
        gradient=g,
        prev_gradient=jnp.zeros_like(g),
        iteration=jnp.int32(0),
        nfev=jnp.int32(g_cost),
        gfev=jnp.int32(1),
        max_grad_norm=jnp.asarray(0.0, x0.dtype),
        key=key,
        done=jnp.asarray(False),
        converged=jnp.asarray(False),
    )


def step(fn: Objective, state: GDState, config: GDConfig) -> GDState:
    dtype = state.x.dtype
    n = state.x.shape[-1]
    grad_fn, g_cost = make_grad(fn, n, config.deriv)

    grad_norm = jnp.linalg.norm(state.gradient)
    max_grad_norm = jnp.maximum(state.max_grad_norm, grad_norm)
    hit_tol = grad_norm < config.grad_eps
    done_now = (
        (state.iteration >= config.max_iter) | hit_tol | jnp.isinf(grad_norm)
    )
    halted = state._replace(
        max_grad_norm=max_grad_norm, done=jnp.asarray(True), converged=hit_tol
    )

    nfev = state.nfev
    gfev = state.gfev
    alpha = jnp.asarray(config.alpha, dtype)
    if config.step_type == "linesearch":
        direction = -state.gradient
        f0 = fn(state.x)
        nfev = nfev + 1
        ls = more_thuente(
            fn, grad_fn, state.x, f0, state.gradient, direction, config.alpha
        )
        alpha = ls.alpha
        nfev = nfev + ls.nfev * (1 + g_cost)
        gfev = gfev + ls.nfev
    elif config.step_type == "anneal":
        # cooling schedule (nlsolver.h:2997)
        alpha = alpha / (1.0 + state.iteration.astype(dtype) / config.max_iter)
        if config.variant == "safeguarded":
            # NON-DEFAULT divergence guard: the reference schedule takes
            # raw alpha*g steps, which explode on curved problems (12 of
            # 15 suite problems diverge — see PARITY.md).  Reuse the
            # Bigstep Lipschitz proxy (nlsolver.h:3010-3012): scale by
            # the largest gradient norm seen, shrink-only.
            alpha = alpha / jnp.maximum(max_grad_norm, 1.0)
    elif config.step_type == "bigstep":
        offset, length = BIGSTEP_OFFSETS[config.bigstep_level]
        table = jnp.asarray(BIGSTEP_TABLE, dtype)
        alpha = table[offset + state.iteration % length]
        if config.lipschitz_scaling:
            alpha = alpha / max_grad_norm
    # fixed & page: alpha unchanged

    if config.variant == "reference" and config.step_type in ("fixed", "page"):
        # nlsolver.h:3014: alpha_ *= f_multiplier compounds every iteration,
        # flipping the step direction — descent on even iterations only.
        alpha = jnp.where(state.iteration % 2 == 0, alpha, -alpha)

    new_x = state.x - alpha * state.gradient
    new_grad = grad_fn(new_x)
    nfev = nfev + g_cost
    gfev = gfev + 1

    key = state.key
    if config.step_type == "page":
        # PAGE (arXiv:2008.10898-style probabilistic gradient correction;
        # reference nlsolver.h:3018-3031).  With probability 1-p use the
        # cheap correction grad + ratio*(grad - prev_grad).
        if config.variant == "reference":
            # size_t division: 128 // (11 + 128) == 0 (nlsolver.h:2944-2945)
            p = config.minibatch // (config.minibatch_prime + config.minibatch)
        else:
            p = config.minibatch / (config.minibatch_prime + config.minibatch)
        ratio = config.minibatch / config.minibatch_prime
        key, k_u = jax.random.split(state.key)
        u = jax.random.uniform(k_u, (), dtype=dtype)
        corrected = (new_grad - state.gradient) * ratio + new_grad
        new_grad = jnp.where(u > p, corrected, new_grad)

    worked = GDState(
        x=new_x,
        gradient=new_grad,
        prev_gradient=state.gradient,
        iteration=state.iteration + 1,
        nfev=nfev,
        gfev=gfev,
        max_grad_norm=max_grad_norm,
        key=key,
        done=jnp.asarray(False),
        converged=jnp.asarray(False),
    )
    from ..core.utils import tree_where

    return tree_where(done_now, halted, worked)


def _finalize(fn, state: GDState, flip_sign: bool) -> SolverResult:
    f_val = fn(state.x)  # reference evaluates at exit (nlsolver.h:2976)
    return make_result(
        x=state.x,
        f_value=-f_val if flip_sign else f_val,
        iterations=state.iteration,
        function_calls=state.nfev + 1,
        gradient_calls=state.gfev,
        converged=state.converged,
    )


def minimize(
    fn: Objective,
    x0: jax.Array,
    config: GDConfig = GDConfig(),
    bounds: Optional[Bounds] = None,
    *,
    key: Optional[jax.Array] = None,
    _minimize: bool = True,
) -> SolverResult:
    if key is None:
        key = jax.random.key(0)
    sfn = signed(fn, _minimize)
    state = init(sfn, x0, config, key)
    state = drive(lambda s: step(sfn, s, config), state)
    return _finalize(sfn, state, flip_sign=not _minimize)


def maximize(fn, x0, config: GDConfig = GDConfig(), bounds=None, *, key=None):
    return minimize(fn, x0, config, bounds, key=key, _minimize=False)
