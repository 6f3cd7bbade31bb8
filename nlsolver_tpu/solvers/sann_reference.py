"""Sequential-consumption emulation of the reference SANN — stochastic
trajectory parity.

Replays ``SANN::solve`` (nlsolver.h:2773-2814) draw for draw on the
bit-parity reference RNGs, the companion of :mod:`.de_reference` for the
simulated-annealing family (production path: :mod:`.sann`).  Consumption
order per outer iteration: ``temperature_iter - 1`` inner proposals, each
drawing two uniforms per dimension through the reference's Box-Muller
``rnorm`` (nlsolver.h:2479-2485; g++ evaluates the left multiplicand
first, so the sqrt/log draw precedes the cos draw), then ONE extra
uniform for the Metropolis test — consumed only when the proposal is
worse (the ``||`` in nlsolver.h:2804 short-circuits).

Reference quirks reproduced (same list as SANNConfig(metropolis_vs_best)
documents): the Metropolis difference is measured against the BEST value
seen, not the current Markov state's value; pi is truncated to 3.141593
in rnorm; e-1 is truncated to 1.7182818 in the cooling schedule
(nlsolver.h:2775).  Termination is max_iter only (nlsolver.h:2787).

Verified bit-exact per prefix in tests/test_trajectory_parity.py.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core import Objective, SolverResult, drive, make_result, signed
from ..core.utils import exact_product, tree_where
from ..random import reference_rngs
from ..random.sampling import box_muller_parity

_E_MINUS_1 = 1.7182818  # truncated e-1 (nlsolver.h:2775)


@dataclass(frozen=True)
class SANNReferenceConfig:
    """Reference defaults (nlsolver.h:2754-2756)."""

    max_iter: int = 5000
    temperature_iter: int = 10
    temperature_max: float = 10.0
    rng: str = "xorshift"


class SANNRefState(NamedTuple):
    x: jax.Array          # best point seen (the reference's in-place x)
    best_val: jax.Array
    p: jax.Array          # current Markov-chain state
    rng: tuple
    iteration: jax.Array
    nfev: jax.Array
    done: jax.Array
    converged: jax.Array


def init(fn: Objective, x0: jax.Array, config: SANNReferenceConfig) -> SANNRefState:
    x0 = jnp.asarray(x0)
    rng0, _ = reference_rngs.make(config.rng, dtype=x0.dtype)
    return SANNRefState(
        x=x0,
        best_val=fn(x0),
        p=x0,
        rng=rng0,
        iteration=jnp.int32(0),
        nfev=jnp.int32(1),
        done=jnp.asarray(False),
        converged=jnp.asarray(False),
    )


def step(fn: Objective, state: SANNRefState, config: SANNReferenceConfig) -> SANNRefState:
    dtype = state.p.dtype
    _, nxt = reference_rngs.make(config.rng, dtype=dtype)

    done_now = state.iteration >= config.max_iter
    halted = state._replace(done=jnp.asarray(True))

    tmax = jnp.asarray(config.temperature_max, dtype)
    scale = 1.0 / tmax                                 # nlsolver.h:2777
    t = tmax / jnp.log(state.iteration.astype(dtype) + _E_MINUS_1)

    def inner(carry, _):
        x, best_val, p, rng, nfev = carry
        cs = t * scale

        def dim_body(rng_c, p_i):
            u1, rng_c = nxt(rng_c)                     # sqrt/log draw first
            u2, rng_c = nxt(rng_c)
            z = box_muller_parity(u1, u2)
            return rng_c, p_i + exact_product(cs * z)

        rng, ptry = lax.scan(dim_body, rng, p)
        val = fn(ptry)
        nfev = nfev + 1
        diff = val - best_val                          # vs BEST, nlsolver.h:2803

        def metropolis(r):
            u, r = nxt(r)
            return r, u < jnp.exp(-diff / t)

        rng, met = lax.cond(
            diff <= 0.0, lambda r: (r, jnp.asarray(True)), metropolis, rng
        )
        p = jnp.where(met, ptry, p)
        improved = val <= best_val                     # implies met
        x = jnp.where(improved, ptry, x)
        best_val = jnp.where(improved, val, best_val)
        return (x, best_val, p, rng, nfev), None

    (x, best_val, p, rng, nfev), _ = lax.scan(
        inner,
        (state.x, state.best_val, state.p, state.rng, state.nfev),
        None,
        length=config.temperature_iter - 1,            # j = 1..titer-1
    )

    worked = SANNRefState(
        x=x,
        best_val=best_val,
        p=p,
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
    config: SANNReferenceConfig = SANNReferenceConfig(),
    bounds=None,
    *,
    _minimize: bool = True,
) -> SolverResult:
    sfn = signed(fn, _minimize)
    state = init(sfn, jnp.asarray(x0), config)
    state = drive(lambda s: step(sfn, s, config), state)
    return make_result(
        x=state.x,
        f_value=-state.best_val if not _minimize else state.best_val,
        iterations=state.iteration,
        function_calls=state.nfev,
        converged=state.converged,
    )


def maximize(fn, x0, config: SANNReferenceConfig = SANNReferenceConfig(), bounds=None):
    return minimize(fn, x0, config, bounds, _minimize=False)
