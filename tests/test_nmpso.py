"""NM-PSO hybrid: statistical parity on the reference pass list."""
from functools import cache

import jax
import jax.numpy as jnp
import pytest

from nlsolver_tpu.problems import PROBLEMS
from nlsolver_tpu.solvers import nmpso
from nlsolver_tpu.solvers.nmpso import NMPSOConfig

from reference_matrix import passes

NMPSO_PASSES = passes("nmpso")
TOL = 0.05


@cache
def _seed_sweep(fn, cfg, dim):
    return jax.jit(
        jax.vmap(
            lambda k: nmpso.minimize(
                fn, jnp.full((dim,), -0.5, jnp.float64), cfg, key=k
            )
        )
    )


@pytest.mark.parametrize("name", NMPSO_PASSES)
def test_converges(name):
    p = PROBLEMS[name]
    keys = jax.random.split(jax.random.key(42), 8)
    res = _seed_sweep(p.fn, NMPSOConfig(), p.dim)(keys)
    dists = jax.vmap(p.distance_to_nearest_minimum)(res.x)
    n_pass = int(jnp.sum(dists <= TOL))
    assert n_pass >= 4, (name, n_pass, jnp.round(dists, 3))


def test_rejects_1d():
    with pytest.raises(ValueError):
        nmpso.minimize(lambda x: x[0] ** 2, jnp.asarray([1.0]))


def test_bounded():
    from nlsolver_tpu.core import Bounds

    p = PROBLEMS["sphere"]
    bounds = Bounds(lower=jnp.array([0.25, 0.25]), upper=jnp.array([3.0, 3.0]))
    res = jax.jit(
        lambda x0, k: nmpso.minimize(p.fn, x0, NMPSOConfig(), bounds=bounds, key=k)
    )(jnp.array([1.0, 1.0]), jax.random.key(3))
    assert bool(jnp.all(res.x >= 0.25 - 1e-9)) and bool(jnp.all(res.x <= 3.0 + 1e-9))
    assert float(jnp.max(jnp.abs(res.x - 0.25))) <= TOL
