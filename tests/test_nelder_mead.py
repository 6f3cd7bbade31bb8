"""Nelder-Mead: convergence on the reference suite from the reference's
start point x0 = (-0.5, ...) with its tolerance |x - x*| <= 0.05
(test_functions.h:395, :432), plus jit/vmap composition."""
import jax
import jax.numpy as jnp
import pytest

from nlsolver_tpu.problems import PROBLEMS
from nlsolver_tpu.solvers import nelder_mead
from nlsolver_tpu.solvers.nelder_mead import NelderMeadConfig

from helpers import solve, start_point
from reference_matrix import passes

# pairs the reference binary passes with Nelder-Mead (reference_test_matrix.tsv)
NM_REFERENCE_PASSES = passes("nelder_mead")
assert "levi_n13" not in NM_REFERENCE_PASSES  # reference fails that pair too

TOL = 0.05
CFG = NelderMeadConfig()


@pytest.mark.parametrize("name", NM_REFERENCE_PASSES)
def test_converges_on_reference_passes(name):
    p = PROBLEMS[name]
    res = solve(nelder_mead, p.fn, start_point(p), CFG)
    dist = float(p.distance_to_nearest_minimum(res.x))
    assert dist <= TOL, (name, res.x, dist)


def test_rosenbrock_readme_example():
    # README.md:77-110 flagship: NM on Rosenbrock
    p = PROBLEMS["rosenbrock"]
    res = solve(nelder_mead, p.fn, start_point(p), CFG)
    assert float(res.f_value) < 1e-3
    assert res.function_calls > 0
    assert res.iterations > 0


def test_maximize_is_negated_minimize():
    p = PROBLEMS["sphere"]
    res = jax.jit(lambda x0: nelder_mead.maximize(lambda x: -p.fn(x), x0))(
        start_point(p)
    )
    assert float(res.f_value) > -1e-3  # max of -sphere is 0
    assert float(jnp.max(jnp.abs(res.x))) < TOL


def test_vmap_batch_of_starts():
    p = PROBLEMS["rosenbrock"]
    starts = jnp.stack([start_point(p) + 0.1 * i for i in range(8)])
    batch = jax.jit(jax.vmap(lambda x0: nelder_mead.minimize(p.fn, x0, CFG)))(starts)
    assert batch.x.shape == (8, 2)
    dists = jax.vmap(p.distance_to_nearest_minimum)(batch.x)
    assert float(jnp.max(dists)) <= TOL


def test_bounds_respected():
    from nlsolver_tpu.core import Bounds

    p = PROBLEMS["sphere"]
    bounds = Bounds(lower=jnp.array([0.5, 0.5]), upper=jnp.array([2.0, 2.0]))
    res = jax.jit(
        lambda x0: nelder_mead.minimize(p.fn, x0, CFG, bounds=bounds)
    )(jnp.array([1.0, 1.0]))
    assert bool(jnp.all(res.x >= 0.5 - 1e-9))
    assert bool(jnp.all(res.x <= 2.0 + 1e-9))
    # constrained optimum of sphere on [0.5,2]^2 is (0.5, 0.5)
    assert float(jnp.max(jnp.abs(res.x - 0.5))) <= TOL


def test_restarts_accumulate_counters():
    p = PROBLEMS["rosenbrock"]
    r0 = solve(nelder_mead, p.fn, start_point(p), NelderMeadConfig(restarts=0))
    r2 = solve(nelder_mead, p.fn, start_point(p), NelderMeadConfig(restarts=2))
    assert int(r2.function_calls) > int(r0.function_calls)
    assert float(r2.f_value) <= float(r0.f_value) + 1e-12
