"""L-BFGS(-B) and coordinate descent — the reference's changelist.txt TODOs,
implemented here as extensions beyond the reference's shipped surface."""
import jax
import jax.numpy as jnp
import pytest

from nlsolver_tpu.core import Bounds
from nlsolver_tpu.problems import PROBLEMS
from nlsolver_tpu.solvers import coordinate, lbfgs
from nlsolver_tpu.solvers.coordinate import CoordinateDescentConfig
from nlsolver_tpu.solvers.lbfgs import LBFGSConfig

from helpers import start_point

TOL = 0.05


@pytest.mark.parametrize("name", ["sphere", "rosenbrock", "booth", "beale", "matyas"])
def test_lbfgs_converges(name):
    p = PROBLEMS[name]
    res = jax.jit(lambda x0: lbfgs.minimize(p.fn, x0, LBFGSConfig()))(start_point(p))
    dist = float(p.distance_to_nearest_minimum(res.x))
    assert dist <= TOL, (name, res.x)


def test_lbfgs_high_dim():
    # 100-D rosenbrock — the problem class L-BFGS exists for
    fn = PROBLEMS["rosenbrock"].fn
    x0 = jnp.full((100,), -0.5, jnp.float64)
    res = jax.jit(
        lambda x0: lbfgs.minimize(fn, x0, LBFGSConfig(max_iter=2000, grad_eps=1e-8))
    )(x0)
    assert float(res.f_value) < 1e-6, float(res.f_value)


def test_lbfgs_box_bounds():
    p = PROBLEMS["sphere"]
    bounds = Bounds(lower=jnp.array([0.5, 0.5]), upper=jnp.array([2.0, 2.0]))
    res = jax.jit(
        lambda x0: lbfgs.minimize(p.fn, x0, LBFGSConfig(), bounds=bounds)
    )(jnp.array([1.5, 1.5]))
    assert bool(jnp.all(res.x >= 0.5 - 1e-9)) and bool(jnp.all(res.x <= 2.0 + 1e-9))
    assert float(jnp.max(jnp.abs(res.x - 0.5))) <= 1e-4


def test_lbfgs_vmap():
    p = PROBLEMS["rosenbrock"]
    starts = jnp.stack([start_point(p) + 0.1 * i for i in range(8)])
    res = jax.jit(
        jax.vmap(lambda x0: lbfgs.minimize(p.fn, x0, LBFGSConfig()))
    )(starts)
    dists = jax.vmap(p.distance_to_nearest_minimum)(res.x)
    assert float(jnp.max(dists)) <= TOL


@pytest.mark.parametrize("name", ["sphere", "booth", "matyas"])
def test_coordinate_descent(name):
    p = PROBLEMS[name]
    res = jax.jit(
        lambda x0: coordinate.minimize(p.fn, x0, CoordinateDescentConfig())
    )(start_point(p))
    dist = float(p.distance_to_nearest_minimum(res.x))
    assert dist <= TOL, (name, res.x)


def test_coordinate_descent_separable_10d():
    # separable objective: CD solves it exactly, one sweep per coordinate scale
    fn = lambda x: jnp.sum((x - jnp.arange(10.0)) ** 2)
    res = jax.jit(
        lambda x0: coordinate.minimize(fn, x0, CoordinateDescentConfig(bracket=16.0))
    )(jnp.zeros(10))
    assert float(res.f_value) < 1e-8
