"""Sequential-consumption emulation of the reference DE — stochastic
trajectory parity.

The production DE lives in :mod:`.de` (synchronous vectorized generations)
and :mod:`.de_batched` (column-major fleets); both draw from counter-based
``jax.random`` keys and deliberately do NOT reproduce the reference's
random stream.  This module does the opposite: it replays the reference's
``DE::solve`` (nlsolver.h:2404-2476) draw for draw on the bit-parity
reference RNGs (:mod:`nlsolver_tpu.random.reference_rngs`), so a run here
lands on the *identical* population trajectory as the reference binary.
Verified per-prefix in tests/test_trajectory_parity.py (golden data from
tools/traj_probe.cpp).

Consumption order being emulated, per generation, per agent ``i`` (the
reference's inner loop, nlsolver.h:2449-2472; agents mutate in place, so
later agents see earlier agents' accepted proposals within the SAME
generation):

1. ``generate_indices`` (nlsolver.h:2331-2355): draw ``u``, candidate =
   ``(size_t)(u * pop)``, rejected (and redrawn) while it collides with
   the fixed agent or an already-accepted partner — a data-dependent
   number of draws, emulated with ``lax.while_loop``.
2. one draw for the always-mutated dimension (nlsolver.h:2364).
3. exactly one draw per dimension for the crossover test: the reference's
   ``generator() < crossover_probability || i == dim`` (nlsolver.h:2367)
   evaluates the generator FIRST, so the draw is consumed even when
   ``i == dim`` forces mutation.

The solver state machine follows the usual init/step/done contract, so it
composes with ``core.drive`` / ``drive_trace``; it is intentionally
sequential (scan over agents, while_loop inside) and therefore slow —
a parity/debugging tool, not the production path.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..core import Objective, SolverResult, batch_eval, drive, make_result, signed
from ..core.utils import exact_product, std_err, tree_where
from ..random import reference_rngs


@dataclass(frozen=True)
class DEReferenceConfig:
    """Reference defaults (nlsolver.h:2390-2394); ``rng`` picks the
    reference generator (its default-constructed seeding quirks included)."""

    crossover_prob: float = 0.9
    differential_weight: float = 0.8
    eps: float = 1e-3           # reference writes 10e-4
    pop_size: int = 50
    max_iter: int = 1000
    best_value_no_change: int = 50
    strategy: str = "random"    # RecombinationStrategy {random, best}
    rng: str = "xorshift"       # xorshift | xoshiro | splitmix


class DERefState(NamedTuple):
    agents: jax.Array         # [pop, dim]
    scores: jax.Array         # [pop]
    rng: tuple                # reference generator state (pytree)
    best_id: jax.Array        # running best index (nlsolver.h:2428, 2432-2437)
    val_no_change: jax.Array
    iteration: jax.Array
    nfev: jax.Array
    done: jax.Array
    converged: jax.Array


def _next_fn(config: DEReferenceConfig, dtype):
    _, nxt = reference_rngs.make(config.rng, dtype=dtype)
    return nxt


def init(fn: Objective, x0: jax.Array, config: DEReferenceConfig) -> DERefState:
    x0 = jnp.asarray(x0)
    rng0, nxt = reference_rngs.make(config.rng, dtype=x0.dtype)
    # init_agents (nlsolver.h:2302-2323): agent-major, dim-minor draw order;
    # agent[i, j] = (u - 0.5) * x0[j] (x0 is a width, not a location)
    us, rng = reference_rngs.sample(rng0, nxt, config.pop_size * x0.shape[-1])
    agents = (us.reshape(config.pop_size, x0.shape[-1]) - 0.5) * x0[None, :]
    scores = batch_eval(fn, agents)
    return DERefState(
        agents=agents,
        scores=scores,
        rng=rng,
        best_id=jnp.int32(0),
        val_no_change=jnp.int32(0),
        iteration=jnp.int32(0),
        nfev=jnp.int32(config.pop_size),
        done=jnp.asarray(False),
        converged=jnp.asarray(False),
    )


def _best_scan(scores: jax.Array, best_id: jax.Array):
    """The reference's running best scan (nlsolver.h:2432-2437).  The final
    index equals first-argmin iff any score beats the incumbent — on ties
    the incumbent is kept (strict <), so this is NOT plain argmin."""
    gmin = jnp.min(scores)
    updated = gmin < scores[best_id]
    new_id = jnp.where(updated, jnp.argmin(scores).astype(jnp.int32), best_id)
    return new_id, updated


def step(fn: Objective, state: DERefState, config: DEReferenceConfig) -> DERefState:
    pop, n = state.agents.shape
    dtype = state.agents.dtype
    nxt = _next_fn(config, dtype)

    best_id, updated = _best_scan(state.scores, state.best_id)
    # val_no_change = not_updated * (val_no_change + 1)  (nlsolver.h:2440)
    val_no_change = jnp.where(updated, 0, state.val_no_change + 1)
    hit_tol = (val_no_change >= config.best_value_no_change) | (
        std_err(state.scores) < config.eps
    )
    done_now = (state.iteration >= config.max_iter) | hit_tol
    halted = state._replace(
        best_id=best_id,
        val_no_change=val_no_change,
        done=jnp.asarray(True),
        converged=hit_tol,
    )

    cp = jnp.asarray(config.crossover_prob, dtype)
    fw = jnp.asarray(config.differential_weight, dtype)
    pop_f = jnp.asarray(float(pop), dtype)
    n_f = jnp.asarray(float(n), dtype)


    def agent_body(carry, i):
        agents, scores, rng, nfev = carry
        if config.strategy == "best":
            fixed = best_id
        else:
            fixed = i

        # generate_indices: rejection loop, set = {fixed} + accepted so far.
        # Unset partner slots are initialized to `fixed`, so the membership
        # test is always (cand != fixed) & (cand != r1) & (cand != r2).
        def cond(c):
            return c[4] < 3

        def body(c):
            rng_c, r1, r2, r3, count = c
            u, rng_c = nxt(rng_c)
            cand = (u * pop_f).astype(jnp.int32)   # (size_t)(u * max)
            is_new = (cand != fixed) & (cand != r1) & (cand != r2)
            r1 = jnp.where(is_new & (count == 0), cand, r1)
            r2 = jnp.where(is_new & (count == 1), cand, r2)
            r3 = jnp.where(is_new & (count == 2), cand, r3)
            return (rng_c, r1, r2, r3, count + is_new.astype(jnp.int32))

        rng, r1, r2, r3, _ = lax.while_loop(
            cond, body, (rng, fixed, fixed, fixed, jnp.int32(0))
        )

        # propose_new_agent (nlsolver.h:2357-2375)
        u, rng = nxt(rng)
        forced = (u * n_f).astype(jnp.int32)

        def dim_body(rng_c, j):
            u_j, rng_c = nxt(rng_c)
            mutate = (u_j < cp) | (j == forced)
            # exact_product: the probe binary has no FMA ISA, so the
            # donor's mul and add must round separately (core.utils doc)
            donor = agents[r1, j] + exact_product(
                fw * (agents[r2, j] - agents[r3, j])
            )
            return rng_c, jnp.where(mutate, donor, agents[fixed, j])

        rng, proposal = lax.scan(dim_body, rng, jnp.arange(n, dtype=jnp.int32))

        score = fn(proposal)
        nfev = nfev + 1
        accept = score < scores[i]
        agents = agents.at[i].set(jnp.where(accept, proposal, agents[i]))
        scores = scores.at[i].set(jnp.where(accept, score, scores[i]))
        return (agents, scores, rng, nfev), None

    (agents, scores, rng, nfev), _ = lax.scan(
        agent_body,
        (state.agents, state.scores, state.rng, state.nfev),
        jnp.arange(pop, dtype=jnp.int32),
    )

    worked = DERefState(
        agents=agents,
        scores=scores,
        rng=rng,
        best_id=best_id,
        val_no_change=val_no_change,
        iteration=state.iteration + 1,
        nfev=nfev,
        done=jnp.asarray(False),
        converged=jnp.asarray(False),
    )
    return tree_where(done_now, halted, worked)


def report_best(state: DERefState) -> jax.Array:
    """Index the reference would report if it stopped now: one more best
    scan at loop entry (nlsolver.h:2432-2443).  Idempotent on frozen states
    (the freezing step already ran the scan and scores are unchanged)."""
    best_id, _ = _best_scan(state.scores, state.best_id)
    return best_id


def _finalize(state: DERefState, flip_sign: bool) -> SolverResult:
    b = report_best(state)
    f_val = state.scores[b]
    return make_result(
        x=state.agents[b],
        f_value=-f_val if flip_sign else f_val,
        iterations=state.iteration,
        function_calls=state.nfev,
        converged=state.converged,
    )


def minimize(
    fn: Objective,
    x0: jax.Array,
    config: DEReferenceConfig = DEReferenceConfig(),
    bounds=None,
    *,
    _minimize: bool = True,
) -> SolverResult:
    sfn = signed(fn, _minimize)
    state = init(sfn, jnp.asarray(x0), config)
    state = drive(lambda s: step(sfn, s, config), state)
    return _finalize(state, flip_sign=not _minimize)


def maximize(fn, x0, config: DEReferenceConfig = DEReferenceConfig(), bounds=None):
    return minimize(fn, x0, config, bounds, _minimize=False)
