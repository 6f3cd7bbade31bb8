"""Nelder-Mead / PSO hybrid.

Re-creation of the reference's ``NelderMeadPSO`` (nlsolver.h:3546-3920):
3n+1 particles; each iteration ranks all particles, applies one Nelder-Mead
update (textbook contraction orientation — this class uses
``simplex_transform<reflect=false>``, unlike the reference's plain
NelderMead) to the top n+1, and a pairwise-best PSO update to the remaining
2n.  Implied bounds ±|2.5 x_i| seed the PSO particles when called unbounded
(nlsolver.h:3585-3592).

Deliberate fixes of reference defects (all documented in SURVEY.md §2):
  * velocities persist between iterations — the reference copies the
    velocity vector instead of taking a reference (``velocity =
    particle_velocities[id]``, nlsolver.h:3843-3845), so its updates are
    silently discarded;
  * the pairwise best is the better-ranked member of each sorted PSO pair —
    the reference's ``order_flip`` bookkeeping points even-offset particles
    at their *worse* neighbor (nlsolver.h:3831-3840);
  * the stagnation counter compares against the best value of the previous
    iteration — the reference compares against the pre-loop value of
    particle 0 forever (nlsolver.h:3649-3663);
  * bounded updates clamp positions per-dimension — the reference clamps
    the velocity and indexes bounds by particle (nlsolver.h:3858-3860).

Termination (nlsolver.h:3664-3669): max_iter, best unchanged for
``no_change_best_iter``, or sample-std over the simplex subset < eps.
Requires n >= 2 (the reference prints and returns a dummy status 999999;
here it raises).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..core import (
    Bounds,
    Objective,
    SolverResult,
    batch_eval,
    drive,
    make_result,
    signed,
    std_err,
)
from .nelder_mead import init_simplex


@dataclass(frozen=True)
class NMPSOConfig:
    """Defaults from nlsolver.h:3563-3569."""

    alpha: float = 1.0
    gamma: float = 2.0
    rho: float = 0.5
    sigma: float = 0.5
    inertia: float = 0.8
    cognitive_coef: float = 1.8
    social_coef: float = 1.8
    eps: float = 1e-6
    max_iter: int = 1000
    no_change_best_iter: int = 20


class NMPSOState(NamedTuple):
    positions: jax.Array   # [3n+1, n]
    velocities: jax.Array  # [3n+1, n]
    values: jax.Array      # [3n+1]
    best_value: jax.Array
    iteration: jax.Array
    nfev: jax.Array
    no_change: jax.Array
    key: jax.Array
    done: jax.Array
    converged: jax.Array


def init(
    fn: Objective,
    x0: jax.Array,
    config: NMPSOConfig,
    key: jax.Array,
    lower: jax.Array,
    upper: jax.Array,
) -> NMPSOState:
    n = x0.shape[-1]
    if n < 2:
        raise ValueError(
            "NelderMeadPSO requires dimension >= 2 (nlsolver.h:3627-3636); "
            "use NelderMead or PSO for 1-D problems"
        )
    n_simplex = n + 1
    n_pso = 2 * n
    key, k_pos, k_vel = jax.random.split(key, 3)

    simplex = init_simplex(x0, -1.0)  # Gao/Han (nlsolver.h:3703-3724)
    u = jax.random.uniform(k_pos, (n_pso, n), dtype=x0.dtype)
    pso_pos = lower[None, :] + (upper - lower)[None, :] * u
    positions = jnp.concatenate([simplex, pso_pos], axis=0)

    span = jnp.abs(upper - lower)
    uv = jax.random.uniform(k_vel, (n_pso, n), dtype=x0.dtype)
    pso_vel = span[None, :] * (2.0 * uv - 1.0)
    velocities = jnp.concatenate(
        [jnp.zeros((n_simplex, n), x0.dtype), pso_vel], axis=0
    )

    values = batch_eval(fn, positions)
    return NMPSOState(
        positions=positions,
        velocities=velocities,
        values=values,
        best_value=jnp.min(values),
        iteration=jnp.int32(0),
        nfev=jnp.int32(positions.shape[0]),
        no_change=jnp.int32(0),
        key=key,
        done=jnp.asarray(False),
        converged=jnp.asarray(False),
    )


def step(
    fn: Objective,
    state: NMPSOState,
    config: NMPSOConfig,
    lower: jax.Array,
    upper: jax.Array,
    bounded: bool,
) -> NMPSOState:
    P, n = state.positions.shape
    n_simplex = n + 1
    n_pso = 2 * n
    dtype = state.positions.dtype

    order = jnp.argsort(state.values)
    best_now = state.values[order[0]]
    same = best_now == state.best_value
    no_change = jnp.where(same, state.no_change + 1, 0)

    simplex_vals = state.values[order[:n_simplex]]
    hit_tol = (no_change >= config.no_change_best_iter) | (
        std_err(simplex_vals) < config.eps
    )
    done_now = (state.iteration >= config.max_iter) | hit_tol
    halted = state._replace(
        best_value=best_now,
        no_change=no_change,
        done=jnp.asarray(True),
        converged=hit_tol,
    )

    def _clamp(x):
        return jnp.clip(x, lower, upper) if bounded else x

    # ---- Nelder-Mead update on the ranked top n+1 (nlsolver.h:3742-3823) ----
    positions, values = state.positions, state.values
    best_id = order[0]
    worst_id = order[n_simplex - 1]
    f_best = values[best_id]
    f_second = values[order[n_simplex - 2]]
    f_worst = values[worst_id]
    x_worst = positions[worst_id]
    centroid = jnp.mean(positions[order[: n_simplex - 1]], axis=0)

    alpha = jnp.asarray(config.alpha, dtype)
    gamma = jnp.asarray(config.gamma, dtype)
    rho = jnp.asarray(config.rho, dtype)
    sigma = jnp.asarray(config.sigma, dtype)

    x_reflect = _clamp(centroid + alpha * (centroid - x_worst))
    f_reflect = fn(x_reflect)
    branch = jnp.where(f_reflect < f_best, 0, jnp.where(f_reflect < f_second, 1, 2))

    def do_expand(pos, val):
        x_expand = _clamp(centroid + gamma * (x_reflect - centroid))
        f_expand = fn(x_expand)
        take = f_expand < f_reflect
        return (
            pos.at[worst_id].set(jnp.where(take, x_expand, x_reflect)),
            val.at[worst_id].set(jnp.where(take, f_expand, f_reflect)),
            jnp.int32(2),
        )

    def do_reflect(pos, val):
        return (
            pos.at[worst_id].set(x_reflect),
            val.at[worst_id].set(f_reflect),
            jnp.int32(1),
        )

    def do_contract(pos, val):
        reflect_better = f_reflect < f_worst
        # textbook orientation: simplex_transform<reflect=false> computes
        # c + rho*(point - c) (nlsolver.h:3786-3796)
        x_contract = _clamp(
            jnp.where(
                reflect_better,
                centroid + rho * (x_reflect - centroid),
                centroid + rho * (x_worst - centroid),
            )
        )
        f_contract = fn(x_contract)
        accept = f_contract < jnp.minimum(f_reflect, f_worst)

        def contracted(args):
            pos, val = args
            return (
                pos.at[worst_id].set(x_contract),
                val.at[worst_id].set(f_contract),
                jnp.int32(2),
            )

        def shrunk(args):
            pos, val = args
            x_best = pos[best_id]
            ranked_ids = order[1:n_simplex]
            shrunk_pts = x_best[None, :] + sigma * (pos[ranked_ids] - x_best[None, :])
            new_vals = batch_eval(fn, shrunk_pts)
            return (
                pos.at[ranked_ids].set(shrunk_pts),
                val.at[ranked_ids].set(new_vals),
                jnp.int32(1 + n_simplex - 1),
            )

        return lax.cond(accept, contracted, shrunk, (pos, val))

    positions, values, nm_evals = lax.switch(
        branch, [do_expand, do_reflect, do_contract], positions, values
    )

    # ---- PSO update on the remaining 2n ranked particles (:3824-3867) ----
    pso_ids = order[n_simplex:]                                   # [2n]
    offsets = jnp.arange(n_pso)
    pair_best_ids = pso_ids[2 * (offsets // 2)]                   # better of each pair
    global_best = positions[jnp.argmin(values)]

    key, k_p, k_g = jax.random.split(state.key, 3)
    r_p = jax.random.uniform(k_p, (n_pso, n), dtype=dtype)
    r_g = jax.random.uniform(k_g, (n_pso, n), dtype=dtype)

    cur = positions[pso_ids]
    vel = state.velocities[pso_ids]
    new_vel = (
        config.inertia * vel
        + config.cognitive_coef * r_p * (positions[pair_best_ids] - cur)
        + config.social_coef * r_g * (global_best[None, :] - cur)
    )
    new_pos = _clamp(cur + new_vel)
    new_vals = batch_eval(fn, new_pos)

    positions = positions.at[pso_ids].set(new_pos)
    values = values.at[pso_ids].set(new_vals)
    velocities = state.velocities.at[pso_ids].set(new_vel)

    worked = NMPSOState(
        positions=positions,
        velocities=velocities,
        values=values,
        best_value=best_now,
        iteration=state.iteration + 1,
        nfev=state.nfev + nm_evals + n_pso,
        no_change=no_change,
        key=key,
        done=jnp.asarray(False),
        converged=jnp.asarray(False),
    )
    from ..core.utils import tree_where

    return tree_where(done_now, halted, worked)


def _finalize(state: NMPSOState, flip_sign: bool) -> SolverResult:
    best = jnp.argmin(state.values)
    f_val = state.values[best]
    return make_result(
        x=state.positions[best],
        f_value=-f_val if flip_sign else f_val,
        iterations=state.iteration,
        function_calls=state.nfev,
        converged=state.converged,
    )


def minimize(
    fn: Objective,
    x0: jax.Array,
    config: NMPSOConfig = NMPSOConfig(),
    bounds: Optional[Bounds] = None,
    *,
    key: Optional[jax.Array] = None,
    _minimize: bool = True,
) -> SolverResult:
    if key is None:
        key = jax.random.key(0)
    sfn = signed(fn, _minimize)
    if bounds is None:
        t = jnp.abs(2.5 * x0)  # implied bounds (nlsolver.h:3585-3592)
        lower, upper = -t, t
        bounded = False
    else:
        lower = jnp.broadcast_to(jnp.asarray(bounds.lower, x0.dtype), x0.shape)
        upper = jnp.broadcast_to(jnp.asarray(bounds.upper, x0.dtype), x0.shape)
        bounded = True
    state = init(sfn, x0, config, key, lower, upper)
    state = drive(lambda s: step(sfn, s, config, lower, upper, bounded), state)
    return _finalize(state, flip_sign=not _minimize)


def maximize(fn, x0, config: NMPSOConfig = NMPSOConfig(), bounds=None, *, key=None):
    return minimize(fn, x0, config, bounds, key=key, _minimize=False)
