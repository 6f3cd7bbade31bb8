"""Cyclic coordinate descent with per-coordinate Brent line minimization.

The reference lists "coordinate descent" as a TODO (changelist.txt:1-8);
this implements the cyclic variant: each outer iteration sweeps the
coordinates (a ``lax.scan`` over the static dimension), minimizing the 1-D
restriction f(x + t e_i) with the Brent minimizer over a local bracket that
adapts to the last accepted step size.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..core import Bounds, Objective, SolverResult, drive, make_result, signed
from .brent import BrentConfig, minimize_scalar


@dataclass(frozen=True)
class CoordinateDescentConfig:
    max_iter: int = 100           # outer sweeps
    bracket: float = 1.0          # initial half-width of the 1-D bracket
    f_tol: float = 1e-10          # sweep-to-sweep improvement tolerance
    brent_tol: float = 1e-10
    brent_max_iter: int = 60


class CDState(NamedTuple):
    x: jax.Array
    f: jax.Array
    prev_f: jax.Array
    bracket: jax.Array
    iteration: jax.Array
    nfev: jax.Array
    done: jax.Array
    converged: jax.Array


def init(fn: Objective, x0: jax.Array, config: CoordinateDescentConfig) -> CDState:
    return CDState(
        x=x0,
        f=fn(x0),
        prev_f=jnp.asarray(jnp.inf, x0.dtype),
        bracket=jnp.asarray(config.bracket, x0.dtype),
        iteration=jnp.int32(0),
        nfev=jnp.int32(1),
        done=jnp.asarray(False),
        converged=jnp.asarray(False),
    )


def step(fn: Objective, state: CDState, config: CoordinateDescentConfig) -> CDState:
    n = state.x.shape[-1]
    dtype = state.x.dtype

    hit_tol = jnp.abs(state.prev_f - state.f) < config.f_tol
    done_now = (state.iteration >= config.max_iter) | hit_tol
    halted = state._replace(done=jnp.asarray(True), converged=hit_tol)

    bcfg = BrentConfig(
        tol=config.brent_tol,
        eps=config.brent_tol,
        max_iter=config.brent_max_iter,
        lower=-1.0,
        upper=1.0,
    )

    def sweep_coord(carry, i):
        x, nfev, width = carry
        e_i = jax.nn.one_hot(i, n, dtype=dtype)
        line = lambda t: fn(x + (t * width) * e_i)
        res = minimize_scalar(line, bcfg)
        t_star = res.x * width
        x = x + t_star * e_i
        return (x, nfev + res.function_calls, width), jnp.abs(t_star)

    (x, nfev, _), steps = lax.scan(
        sweep_coord,
        (state.x, state.nfev, state.bracket),
        jnp.arange(n),
    )
    f_new = fn(x)
    # adapt the bracket to the sweep's largest movement (keeps later sweeps
    # from wasting Brent iterations on a huge interval)
    max_step = jnp.max(steps)
    new_bracket = jnp.clip(4.0 * max_step, 1e-8, config.bracket)

    worked = CDState(
        x=x,
        f=f_new,
        prev_f=state.f,
        bracket=new_bracket,
        iteration=state.iteration + 1,
        nfev=nfev + 1,
        done=jnp.asarray(False),
        converged=jnp.asarray(False),
    )
    from ..core.utils import tree_where

    return tree_where(done_now, halted, worked)


def minimize(
    fn: Objective,
    x0: jax.Array,
    config: CoordinateDescentConfig = CoordinateDescentConfig(),
    bounds: Optional[Bounds] = None,
    *,
    key=None,
    _minimize: bool = True,
) -> SolverResult:
    sfn = signed(fn, _minimize)
    state = init(sfn, x0, config)
    state = drive(lambda s: step(sfn, s, config), state)
    return make_result(
        x=state.x,
        f_value=-state.f if not _minimize else state.f,
        iterations=state.iteration,
        function_calls=state.nfev,
        converged=state.converged,
    )


def maximize(fn, x0, config=CoordinateDescentConfig(), bounds=None, *, key=None):
    return minimize(fn, x0, config, bounds, key=key, _minimize=False)
