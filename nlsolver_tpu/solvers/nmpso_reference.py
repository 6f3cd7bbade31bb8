"""Sequential-consumption emulation of the reference NelderMead-PSO hybrid —
stochastic trajectory parity.

Replays ``NelderMeadPSO::solve`` (nlsolver.h:3546-3920) draw for draw on the
bit-parity reference RNGs (production path: :mod:`.nmpso`).  Per iteration:
particles sort best-to-worst (libstdc++ insertion sort is stable at these
sizes — matched by jnp's stable argsort), the top n+1 get one Nelder-Mead
update (1, 2, or 2+n objective evaluations depending on branch), the bottom
2n get a PSO velocity update drawing ``r_p, r_g`` per (particle, dimension)
in rank order.

Reference quirks reproduced (each observable in the golden trajectories):

* init off-by-one (nlsolver.h:3710-3718): vertex i perturbs dimension i for
  i = 1..n-1 and vertex n's ``positions[i][i]`` read/write is out of bounds
  into allocator slack — observably, vertex n stays at x (the same quirk as
  NelderMead's simplex init, nlsolver.h:1929-1931);
* the velocity-update loop declares ``velocity`` and ``pairwise_best`` as
  COPIES, not references (``std::vector<scalar_t> &particle = ...,
  velocity = ...`` — only the first declarator gets the ``&``,
  nlsolver.h:3838-3840), so ``velocity[j] = temp`` writes to a temporary:
  stored velocities keep their INITIAL values forever (zero for the n+1
  simplex-born particles, the init draws for the 2n PSO-born ones);
* ``best_val`` is read but never reassigned in the solve loop
  (nlsolver.h:3651), so the no-change counter compares against particle 0's
  INITIAL value: once the swarm improves past it the counter can never
  trigger again;
* pairwise-best pattern (order_flip, nlsolver.h:3831-3845): sorted PSO
  ranks (0,1) share rank-0's position as "pairwise best", but each later pair
  (2m, 2m+1) shares rank-(2m+1)'s — the WORSE member;
* the PSO phase reads ``best`` = sorted-best position and each pair's
  ``pairwise_best`` as snapshots taken at that particle's loop iteration,
  so earlier in-phase updates are visible to later particles.

FMA notes: the simplex coefficients are 1, 2, 0.5, 0.5 — exact products,
immune to contraction; only the PSO velocity sum and the init position /
velocity draws need :func:`core.utils.exact_product`.
Verified per-prefix in tests/test_trajectory_parity.py.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core import Objective, SolverResult, batch_eval, drive, make_result, signed
from ..core.utils import exact_product, tree_where
from ..random import reference_rngs


@dataclass(frozen=True)
class NMPSOReferenceConfig:
    """Reference defaults (nlsolver.h:3564-3568)."""

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
    rng: str = "xorshift"


class NMPSORefState(NamedTuple):
    positions: jax.Array     # [n+1 + 2n, n]
    velocities: jax.Array    # [P, n] — constant (reference copy bug)
    values: jax.Array        # [P]
    best_val0: jax.Array     # particle 0's INITIAL value (never updated)
    no_change: jax.Array
    rng: tuple
    iteration: jax.Array
    nfev: jax.Array
    done: jax.Array
    converged: jax.Array


def _sorted_order(values: jax.Array) -> jax.Array:
    # libstdc++ std::sort runs stable insertion sort only below its
    # 16-element threshold, i.e. for 3n+1 <= 16 particles (n <= 5); above
    # that it is unstable introsort and can diverge from jnp's stable
    # argsort on tied values.  init() warns for n > 5.
    return jnp.argsort(values).astype(jnp.int32)


def init(fn: Objective, x0: jax.Array, config: NMPSOReferenceConfig) -> NMPSORefState:
    x0 = jnp.asarray(x0)
    n = x0.shape[-1]
    if n > 5:
        import warnings

        warnings.warn(
            "nmpso_reference bit-parity is only guaranteed for n <= 5 "
            "(3n+1 <= 16 particles keeps libstdc++ std::sort in its stable "
            "insertion-sort regime; larger sorts are unstable introsort and "
            "may order tied values differently)",
            stacklevel=2,
        )
    dtype = x0.dtype
    nm, npso = n + 1, 2 * n
    rng0, nxt = reference_rngs.make(config.rng, dtype=dtype)

    # implied bounds ±|2.5 x_i| (nlsolver.h:3585-3592)
    upper = jnp.abs(2.5 * x0)
    lower = -upper

    # simplex particles with the reference's off-by-one (docstring):
    # vertex i (1 <= i <= n-1) = x with dimension i bumped; vertex n = x
    scale = jnp.clip(jnp.max(jnp.abs(x0)), 1.0, 10.0).astype(dtype)
    pert = jnp.zeros((n, n), dtype=dtype)
    if n > 1:
        idx = jnp.arange(n - 1)
        pert = pert.at[idx, idx + 1].set(1.0)
    vertices = x0[None, :] + scale * pert                     # vertices 1..n
    v0 = x0 + ((1.0 - jnp.sqrt(n + 1.0)) / n * scale).astype(dtype)
    simplex_pos = jnp.concatenate([v0[None, :], vertices], axis=0)

    # PSO particles: per (i, j): position draw then velocity draw
    # (nlsolver.h:3726-3734)
    us, rng = reference_rngs.sample(rng0, nxt, npso * n * 2)
    u = us.reshape(npso, n, 2)
    width = upper - lower
    temp = jnp.abs(width)
    pso_pos = lower[None, :] + exact_product(width[None, :] * u[:, :, 0])
    pso_vel = -temp[None, :] + exact_product(u[:, :, 1] * temp[None, :])

    positions = jnp.concatenate([simplex_pos, pso_pos], axis=0)
    velocities = jnp.concatenate(
        [jnp.zeros((nm, n), dtype=dtype), pso_vel], axis=0
    )
    values = batch_eval(fn, positions)
    return NMPSORefState(
        positions=positions,
        velocities=velocities,
        values=values,
        best_val0=values[0],
        no_change=jnp.int32(0),
        rng=rng,
        iteration=jnp.int32(0),
        nfev=jnp.int32(nm + npso),
        done=jnp.asarray(False),
        converged=jnp.asarray(False),
    )


def report_best(state: NMPSORefState):
    """Index the reference would report: sorted-best = first argmin."""
    return jnp.argmin(state.values).astype(jnp.int32)


def step(fn: Objective, state: NMPSORefState, config: NMPSOReferenceConfig) -> NMPSORefState:
    P, n = state.positions.shape
    nm = n + 1
    dtype = state.positions.dtype
    _, nxt = reference_rngs.make(config.rng, dtype=dtype)

    order = _sorted_order(state.values)

    # no-change counter vs particle 0's INITIAL value (quirk, docstring)
    same = state.best_val0 == state.values[order[0]]
    no_change = jnp.where(same, state.no_change + 1, 0)

    # simplex_std_err over the top n+1 sorted values, reference op order
    # (nlsolver.h:3898-3913)
    acc = jnp.asarray(0.0, dtype)
    svals = [state.values[order[i]] for i in range(nm)]
    for v in svals:
        acc = acc + v
    mean = acc / nm
    acc2 = jnp.asarray(0.0, dtype)
    for v in svals:
        d = v - mean
        acc2 = acc2 + d * d
    serr = jnp.sqrt(acc2 / (nm - 1))

    done_now = (
        (state.iteration >= config.max_iter)
        | (no_change >= config.no_change_best_iter)
        | (serr < config.eps)
    )
    halted = state._replace(
        no_change=no_change, done=jnp.asarray(True),
        converged=(no_change >= config.no_change_best_iter) | (serr < config.eps),
    )

    alpha = jnp.asarray(config.alpha, dtype)
    gamma = jnp.asarray(config.gamma, dtype)
    rho = jnp.asarray(config.rho, dtype)
    sigma = jnp.asarray(config.sigma, dtype)

    # ---- apply_simplex (nlsolver.h:3743-3825) ----
    positions, values = state.positions, state.values
    best_score = values[order[0]]
    worst_id = order[nm - 1]
    second_worst_id = order[nm - 2]
    worst_val = values[worst_id]

    # centroid over sorted ranks 0..nm-2, in rank order (nlsolver.h:3869-3886)
    cacc = jnp.zeros((n,), dtype)
    for i in range(nm - 1):
        cacc = cacc + positions[order[i]]
    centroid = cacc / (nm - 1)

    x_worst = positions[worst_id]
    x_reflect = centroid + alpha * (centroid - x_worst)       # reflect=true
    f_reflect = fn(x_reflect)
    x_expand = centroid + gamma * (x_reflect - centroid)      # reflect=false
    f_expand = fn(x_expand)
    contract_from = jnp.where(f_reflect < worst_val, x_reflect, x_worst)
    x_contract = centroid + rho * (contract_from - centroid)
    f_contract = fn(x_contract)

    b_accept = (f_reflect >= best_score) & (f_reflect < values[second_worst_id])
    b_expand = f_reflect < best_score
    b_contract_ok = (~b_accept) & (~b_expand) & (
        f_contract < jnp.minimum(f_reflect, worst_val)
    )
    b_shrink = (~b_accept) & (~b_expand) & (~b_contract_ok)

    exp_better = f_expand < f_reflect
    new_worst_x = jnp.where(
        b_accept,
        x_reflect,
        jnp.where(
            b_expand,
            jnp.where(exp_better, x_expand, x_reflect),
            x_contract,  # contract-accepted (shrink handled below)
        ),
    )
    new_worst_f = jnp.where(
        b_accept,
        f_reflect,
        jnp.where(
            b_expand,
            jnp.where(exp_better, f_expand, f_reflect),
            f_contract,
        ),
    )
    updated_positions = positions.at[worst_id].set(
        jnp.where(b_shrink, positions[worst_id], new_worst_x)
    )
    updated_values = values.at[worst_id].set(
        jnp.where(b_shrink, values[worst_id], new_worst_f)
    )

    # shrink branch: ranks 1..nm-1 move toward rank 0 and are re-scored
    # (nlsolver.h:3887-3897, :3803-3816); PSO ranks untouched
    best_pos = positions[order[0]]
    shrink_positions = positions
    for i in range(1, nm):
        oid = order[i]
        moved = best_pos + sigma * (positions[oid] - best_pos)
        shrink_positions = shrink_positions.at[oid].set(moved)
    shrink_scores = batch_eval(
        fn, jnp.stack([shrink_positions[order[i]] for i in range(1, nm)])
    )
    shrink_values = values
    for i in range(1, nm):
        shrink_values = shrink_values.at[order[i]].set(shrink_scores[i - 1])

    positions = jnp.where(b_shrink, shrink_positions, updated_positions)
    values = jnp.where(b_shrink, shrink_values, updated_values)
    # after a shrink the reference re-sorts before the PSO phase
    # (nlsolver.h:3817-3823)
    order = jnp.where(b_shrink, _sorted_order(values), order)

    nfev = state.nfev + 1 + jnp.where(
        b_accept, 0, jnp.where(b_shrink, 1 + (nm - 1), 1)
    )

    # ---- apply_pso (nlsolver.h:3826-3868) ----
    inertia = jnp.asarray(config.inertia, dtype)
    cog = jnp.asarray(config.cognitive_coef, dtype)
    soc = jnp.asarray(config.social_coef, dtype)
    best = positions[order[0]]        # snapshot; rank 0 is never a PSO rank

    # pairwise-best rank per PSO rank r: (0,1) -> 0; (2m, 2m+1) -> 2m+1
    pair_rank = []
    for r in range(2 * n):
        m = r // 2
        pair_rank.append(0 if m == 0 else 2 * m + 1)

    def particle_body(carry, inputs):
        positions_c, values_c, rng_c, nfev_c = carry
        rank, pr = inputs
        pid = order[nm + rank]
        pairwise_best = positions_c[order[nm + pr]]   # snapshot per particle
        vel = state.velocities[pid]                   # copy bug: init values
        particle = positions_c[pid]

        def dim_body(c, j):
            rng_d, part = c
            r_p, rng_d = nxt(rng_d)
            r_g, rng_d = nxt(rng_d)
            t = (
                exact_product(inertia * vel[j])
                + exact_product((cog * r_p) * (pairwise_best[j] - part[j]))
            ) + exact_product((soc * r_g) * (best[j] - part[j]))
            return (rng_d, part.at[j].set(part[j] + t)), None

        (rng_c, particle), _ = lax.scan(
            dim_body, (rng_c, particle), jnp.arange(n, dtype=jnp.int32)
        )
        val = fn(particle)
        positions_c = positions_c.at[pid].set(particle)
        values_c = values_c.at[pid].set(val)
        return (positions_c, values_c, rng_c, nfev_c + 1), None

    (positions, values, rng, nfev), _ = lax.scan(
        particle_body,
        (positions, values, state.rng, nfev),
        (jnp.arange(2 * n, dtype=jnp.int32),
         jnp.asarray(pair_rank, jnp.int32)),
    )

    worked = NMPSORefState(
        positions=positions,
        velocities=state.velocities,
        values=values,
        best_val0=state.best_val0,
        no_change=no_change,
        rng=rng,
        iteration=state.iteration + 1,
        nfev=nfev,
        done=jnp.asarray(False),
        converged=jnp.asarray(False),
    )
    return tree_where(done_now, halted, worked)


def minimize(
    fn: Objective,
    x0: jax.Array,
    config: NMPSOReferenceConfig = NMPSOReferenceConfig(),
    bounds=None,
    *,
    _minimize: bool = True,
) -> SolverResult:
    sfn = signed(fn, _minimize)
    state = init(sfn, jnp.asarray(x0), config)
    state = drive(lambda s: step(sfn, s, config), state)
    b = report_best(state)
    f_val = state.values[b]
    return make_result(
        x=state.positions[b],
        f_value=-f_val if not _minimize else f_val,
        iterations=state.iteration,
        function_calls=state.nfev,
        converged=state.converged,
    )


def maximize(fn, x0, config: NMPSOReferenceConfig = NMPSOReferenceConfig(), bounds=None):
    return minimize(fn, x0, config, bounds, _minimize=False)
