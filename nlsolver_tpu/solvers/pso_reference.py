"""Sequential-consumption emulation of the reference ACCELERATED PSO —
stochastic trajectory parity.

Replays ``PSO<..., PSOType::Accelerated>`` (nlsolver.h:2496-2742) draw for
draw on the bit-parity reference RNGs (production path: :mod:`.pso`).
Consumption order: init draws one uniform per (particle, dimension) in
particle-major order (nlsolver.h:2648-2650; Accelerated allocates no
velocities, so the velocity draw of the Vanilla path is absent); each
iteration then draws two uniforms per (particle, dimension) through the
reference Box-Muller ``rnorm`` (left multiplicand first) for the position
update ``inertia*N(0,1) + (1-cognitive)*x + social*swarm_best``
(nlsolver.h:2694-2699), with ``inertia = pow(inertia0, iter)``.

Reference quirks reproduced: the swarm best value starts at 1e5 and
particle bests at 1e4 (nlsolver.h:2631, :2660); the no-change counter is
keyed on ``best_index == 0`` — it also increments when the improving
particle happens to be particle 0 (nlsolver.h:2740); the unbounded
``minimize(x)`` derives bounds as ±|x_i| (nlsolver.h:2554-2560) but the
Accelerated path never clamps to them (``solve<.., false>`` skips
``threshold_positions``).

Only the Accelerated variant is emulated.  The VANILLA velocity update
indexes ``swarm_best_position[i]`` with the PARTICLE index
(nlsolver.h:2674): for any swarm larger than the problem dimension this
reads past the end of an n_dim-sized heap allocation, so the reference's
vanilla trajectories are undefined behavior — they depend on allocator
layout, not on the algorithm — and cannot (and should not) be reproduced.
Verified per-prefix in tests/test_trajectory_parity.py.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core import Objective, SolverResult, batch_eval, drive, make_result, signed
from ..core.utils import exact_product, std_err, tree_where
from ..random import reference_rngs
from ..random.sampling import box_muller_parity


@dataclass(frozen=True)
class PSOAccReferenceConfig:
    """Reference defaults (nlsolver.h:2523-2526)."""

    inertia: float = 0.8
    cognitive_coef: float = 1.8
    social_coef: float = 1.8
    n_particles: int = 10
    max_iter: int = 5000
    best_val_no_change: int = 50
    eps: float = 1e-3           # reference writes 10e-4
    rng: str = "xorshift"


class PSOAccRefState(NamedTuple):
    positions: jax.Array       # [n_particles, n]
    best_values: jax.Array     # per-particle bests [n_particles]
    swarm_best: jax.Array      # [n]
    swarm_best_value: jax.Array
    rng: tuple
    val_no_change: jax.Array
    iteration: jax.Array
    nfev: jax.Array
    done: jax.Array
    converged: jax.Array


def _best_update(fn, positions, best_values, swarm_best, swarm_best_value,
                 val_no_change, nfev):
    """update_best_positions (nlsolver.h:2717-2741): running strict-min scan
    with best_index reset to 0 each call, particle bests as elementwise min,
    no-change counter keyed on best_index == 0."""
    temps = batch_eval(fn, positions)
    # reference scans with strict `<` (nlsolver.h:2723, :2730): NaN
    # evaluations never displace a stored best, so mask them out of the
    # vectorized min/argmin instead of letting jnp.min propagate them
    tclean = jnp.where(jnp.isnan(temps), jnp.inf, temps)
    tmin = jnp.min(tclean)
    updated = tmin < swarm_best_value
    amin = jnp.argmin(tclean).astype(jnp.int32)
    best_index = jnp.where(updated, amin, jnp.int32(0))
    swarm_best_value = jnp.where(updated, tmin, swarm_best_value)
    swarm_best = jnp.where(updated, positions[amin], swarm_best)
    best_values = jnp.where(temps < best_values, temps, best_values)
    val_no_change = jnp.where(best_index == 0, val_no_change + 1, 0)
    nfev = nfev + positions.shape[0]
    return best_values, swarm_best, swarm_best_value, val_no_change, nfev


def init(fn: Objective, x0: jax.Array, config: PSOAccReferenceConfig) -> PSOAccRefState:
    x0 = jnp.asarray(x0)
    n = x0.shape[-1]
    dtype = x0.dtype
    rng0, nxt = reference_rngs.make(config.rng, dtype=dtype)
    # unbounded minimize: bounds ±|x_i| (nlsolver.h:2554-2560)
    upper = jnp.abs(x0)
    lower = -upper
    us, rng = reference_rngs.sample(rng0, nxt, config.n_particles * n)
    u = us.reshape(config.n_particles, n)
    positions = lower[None, :] + (upper - lower)[None, :] * u
    best_values = jnp.full((config.n_particles,), 10000.0, dtype)
    swarm_best_value = jnp.asarray(100000.0, dtype)
    # pre-loop update_best_positions call (nlsolver.h:2599)
    best_values, swarm_best, swarm_best_value, val_no_change, nfev = _best_update(
        fn, positions, best_values, jnp.zeros_like(x0), swarm_best_value,
        jnp.int32(0), jnp.int32(0),
    )
    return PSOAccRefState(
        positions=positions,
        best_values=best_values,
        swarm_best=swarm_best,
        swarm_best_value=swarm_best_value,
        rng=rng,
        val_no_change=val_no_change,
        iteration=jnp.int32(0),
        nfev=nfev,
        done=jnp.asarray(False),
        converged=jnp.asarray(False),
    )


def step(fn: Objective, state: PSOAccRefState, config: PSOAccReferenceConfig) -> PSOAccRefState:
    n_particles, n = state.positions.shape
    dtype = state.positions.dtype
    _, nxt = reference_rngs.make(config.rng, dtype=dtype)

    hit_tol = (state.val_no_change >= config.best_val_no_change) | (
        std_err(state.best_values) < config.eps
    )
    done_now = (state.iteration >= config.max_iter) | hit_tol
    halted = state._replace(done=jnp.asarray(True), converged=hit_tol)

    inertia = jnp.power(
        jnp.asarray(config.inertia, dtype), state.iteration.astype(dtype)
    )
    disc = jnp.asarray(1.0 - config.cognitive_coef, dtype)
    soc = jnp.asarray(config.social_coef, dtype)

    # accelerated position update (nlsolver.h:2694-2699): particle-major,
    # dim-minor; two draws per coordinate via rnorm
    def coord_body(rng_c, idx):
        i, j = idx // n, idx % n
        u1, rng_c = nxt(rng_c)
        u2, rng_c = nxt(rng_c)
        z = box_muller_parity(u1, u2)
        # every product separately rounded (core.utils.exact_product):
        # XLA would otherwise evaluate this as two chained FMAs
        val = (
            exact_product(inertia * z)
            + exact_product(disc * state.positions[i, j])
        ) + exact_product(soc * state.swarm_best[j])
        return rng_c, val

    rng, flat = lax.scan(
        coord_body, state.rng, jnp.arange(n_particles * n, dtype=jnp.int32)
    )
    positions = flat.reshape(n_particles, n)
    # unbounded solve<.., false>: no threshold_positions

    best_values, swarm_best, swarm_best_value, val_no_change, nfev = _best_update(
        fn, positions, state.best_values, state.swarm_best,
        state.swarm_best_value, state.val_no_change, state.nfev,
    )
    worked = PSOAccRefState(
        positions=positions,
        best_values=best_values,
        swarm_best=swarm_best,
        swarm_best_value=swarm_best_value,
        rng=rng,
        val_no_change=val_no_change,
        iteration=state.iteration + 1,
        nfev=nfev,
        done=jnp.asarray(False),
        converged=jnp.asarray(False),
    )
    return tree_where(done_now, halted, worked)


def minimize(
    fn: Objective,
    x0: jax.Array,
    config: PSOAccReferenceConfig = PSOAccReferenceConfig(),
    bounds=None,
    *,
    _minimize: bool = True,
) -> SolverResult:
    sfn = signed(fn, _minimize)
    state = init(sfn, jnp.asarray(x0), config)
    state = drive(lambda s: step(sfn, s, config), state)
    return make_result(
        x=state.swarm_best,
        f_value=(
            -state.swarm_best_value if not _minimize else state.swarm_best_value
        ),
        iterations=state.iteration,
        function_calls=state.nfev,
        converged=state.converged,
    )


def maximize(fn, x0, config: PSOAccReferenceConfig = PSOAccReferenceConfig(), bounds=None):
    return minimize(fn, x0, config, bounds, _minimize=False)
