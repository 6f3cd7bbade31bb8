"""Top-level API + README quickstart snippets (doc-rot guard)."""
import jax
import jax.numpy as jnp
import pytest

import nlsolver_tpu


def rosen(x):
    return 100.0 * (x[0] ** 2 - x[1]) ** 2 + (x[0] - 1.0) ** 2


def test_methods_listing():
    ms = nlsolver_tpu.methods()
    for expected in (
        "nelder_mead", "de", "pso", "sann", "nmpso", "gd", "cgd", "bfgs",
        "lm", "brent", "cmaes", "lbfgs", "coordinate",
    ):
        assert expected in ms, expected


def test_readme_quickstart_single():
    res = nlsolver_tpu.minimize(rosen, [-0.5, -0.5], method="nelder_mead")
    assert float(res.f_value) < 1e-3
    res.print()  # must not raise


def test_readme_quickstart_vmap(key):
    keys = jax.random.split(key, 64)
    batch = jax.jit(
        jax.vmap(
            lambda k: nlsolver_tpu.minimize(
                rosen, jnp.asarray([-0.5, -0.5]), method="de", key=k
            )
        )
    )(keys)
    assert batch.x.shape == (64, 2)
    assert float(jnp.median(batch.f_value)) < 1e-2


def test_readme_quickstart_sharded(key):
    from nlsolver_tpu.parallel import make_mesh, minimize_sharded
    from nlsolver_tpu.solvers.de import DEConfig

    mesh = make_mesh(8, dp=2, pop=4)
    res = minimize_sharded(
        rosen, jnp.full((4, 2), -0.5), DEConfig(pop_size=64), mesh,
        jax.random.split(key, 4),
    )
    assert float(jnp.max(res.f_value)) < 1e-2


def test_unknown_method_raises():
    with pytest.raises(KeyError):
        nlsolver_tpu.minimize(rosen, [0.0, 0.0], method="nope")


def test_maximize_api():
    res = nlsolver_tpu.maximize(lambda x: -rosen(x), [-0.5, -0.5], method="bfgs")
    assert float(res.f_value) > -1e-3
