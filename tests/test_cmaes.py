"""CMA-ES: a real implementation (the reference's is a non-compiling
skeleton) — convergence on smooth + multimodal problems and in higher dims."""
import jax
import jax.numpy as jnp
import pytest

from nlsolver_tpu.problems import PROBLEMS
from nlsolver_tpu.solvers import cmaes
from nlsolver_tpu.solvers.cmaes import CMAESConfig

from helpers import solve, start_point

TOL = 0.05


@pytest.mark.parametrize(
    "name", ["sphere", "rosenbrock", "booth", "matyas", "beale", "mccormick"]
)
def test_converges_smooth(name, key):
    p = PROBLEMS[name]
    res = solve(cmaes, p.fn, start_point(p), CMAESConfig(), key=key)
    dist = float(p.distance_to_nearest_minimum(res.x))
    assert dist <= TOL, (name, res.x, dist)


def test_rastrigin_with_large_population(key):
    p = PROBLEMS["rastrigin"]
    cfg = CMAESConfig(pop_size=64, sigma0=2.0, max_iter=400)
    keys = jax.random.split(key, 8)
    res = jax.jit(
        jax.vmap(lambda k: cmaes.minimize(p.fn, start_point(p), cfg, key=k))
    )(keys)
    dists = jax.vmap(p.distance_to_nearest_minimum)(res.x)
    assert int(jnp.sum(dists <= TOL)) >= 5


def test_10d_sphere(key):
    fn = lambda x: jnp.sum(x * x)
    res = solve(cmaes, fn, jnp.full((10,), 2.0, jnp.float64), CMAESConfig(max_iter=1000), key=key)
    assert float(res.f_value) < 1e-8


def test_10d_rosenbrock(key):
    p = PROBLEMS["rosenbrock"]
    x0 = jnp.full((10,), -0.5, jnp.float64)
    res = solve(cmaes, p.fn, x0, CMAESConfig(max_iter=3000, best_value_no_change=200), key=key)
    assert float(res.f_value) < 1e-6, float(res.f_value)


def test_shekel_4d(key):
    # all 22 reference configs fail Shekel (BASELINE.md); CMA-ES with restarts
    # of sigma cracks it from the same start point
    p = PROBLEMS["shekel"]
    cfg = CMAESConfig(sigma0=3.0, pop_size=64, max_iter=500)
    keys = jax.random.split(key, 8)
    res = jax.jit(
        jax.vmap(lambda k: cmaes.minimize(p.fn, start_point(p), cfg, key=k))
    )(keys)
    dists = jax.vmap(p.distance_to_nearest_minimum)(res.x)
    assert int(jnp.sum(dists <= TOL)) >= 4, jnp.round(dists, 3)
