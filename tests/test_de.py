"""Differential Evolution: convergence on the reference suite + vectorized
index-sampling invariants."""
import jax
import jax.numpy as jnp
import pytest

from nlsolver_tpu.problems import PROBLEMS
from nlsolver_tpu.random.sampling import distinct_indices
from nlsolver_tpu.solvers import de
from nlsolver_tpu.solvers.de import DEConfig

from helpers import solve, start_point
from reference_matrix import passes

# per-strategy pass lists from the measured reference matrix
DE_PASSES = {"random": passes("de_random"), "best": passes("de_best")}
DE_CASES = [
    (name, strategy) for strategy, names in DE_PASSES.items() for name in names
]

TOL = 0.05


@pytest.mark.parametrize("name,strategy", DE_CASES)
def test_converges(name, strategy, key):
    p = PROBLEMS[name]
    cfg = DEConfig(strategy=strategy)
    res = solve(de, p.fn, start_point(p), cfg, key=key)
    dist = float(p.distance_to_nearest_minimum(res.x))
    assert dist <= TOL, (name, strategy, res.x, dist)


def test_distinct_indices_invariants(key):
    pop = 13
    fixed = jnp.arange(pop, dtype=jnp.int32)
    idx = distinct_indices(key, pop, fixed, k=3)
    assert idx.shape == (pop, 3)
    assert int(jnp.min(idx)) >= 0 and int(jnp.max(idx)) < pop
    # distinct from fixed
    assert not bool(jnp.any(idx == fixed[:, None]))
    # mutually distinct
    for a in range(3):
        for b in range(a + 1, 3):
            assert not bool(jnp.any(idx[:, a] == idx[:, b]))


def test_distinct_indices_uniformity(key):
    # over many draws each index should be roughly uniformly used
    pop = 8
    keys = jax.random.split(key, 2000)
    fixed = jnp.zeros((), dtype=jnp.int32)
    draws = jax.jit(
        jax.vmap(lambda k: distinct_indices(k, pop, fixed, k=3))
    )(keys)
    counts = jnp.bincount(draws.reshape(-1), length=pop)
    assert int(counts[0]) == 0  # fixed never drawn
    freq = counts[1:] / jnp.sum(counts)
    assert float(jnp.max(jnp.abs(freq - 1.0 / (pop - 1)))) < 0.02


def test_vmap_batch_of_instances(key):
    p = PROBLEMS["rosenbrock"]
    cfg = DEConfig(max_iter=300)
    keys = jax.random.split(key, 16)
    res = jax.jit(
        jax.vmap(lambda k: de.minimize(p.fn, start_point(p), cfg, key=k))
    )(keys)
    dists = jax.vmap(p.distance_to_nearest_minimum)(res.x)
    # vast majority of seeds converge
    assert int(jnp.sum(dists <= TOL)) >= 14


def test_greedy_selection_monotone(key):
    # population best score never worsens between iterations
    p = PROBLEMS["rastrigin"]
    cfg = DEConfig(max_iter=50)
    state = de.init(p.fn, start_point(p), cfg, key)
    step = jax.jit(lambda s: de.step(p.fn, s, cfg))
    prev_best = float(jnp.min(state.scores))
    for _ in range(20):
        state = step(state)
        cur = float(jnp.min(state.scores))
        assert cur <= prev_best + 1e-12
        prev_best = cur
