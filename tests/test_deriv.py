"""Finite-difference stencils agree with autodiff on smooth objectives."""
import jax
import jax.numpy as jnp
import pytest

from nlsolver_tpu.deriv import fd_gradient, fd_hessian
from nlsolver_tpu.problems import PROBLEMS


@pytest.mark.parametrize("accuracy", [0, 1, 2, 3])
@pytest.mark.parametrize("name", ["sphere", "rosenbrock", "beale", "mccormick"])
def test_fd_gradient_matches_autodiff(name, accuracy):
    p = PROBLEMS[name]
    x = jnp.asarray([-0.3, 0.7])
    g_fd = fd_gradient(p.fn, x, accuracy)
    g_ad = jax.grad(p.fn)(x)
    assert jnp.allclose(g_fd, g_ad, atol=1e-5, rtol=1e-4), (g_fd, g_ad)


@pytest.mark.parametrize("accuracy", [0, 1])
@pytest.mark.parametrize("name", ["sphere", "rosenbrock", "booth"])
def test_fd_hessian_matches_autodiff(name, accuracy):
    p = PROBLEMS[name]
    x = jnp.asarray([-0.3, 0.7])
    h_fd = fd_hessian(p.fn, x, accuracy)
    h_ad = jax.hessian(p.fn)(x)
    assert jnp.allclose(h_fd, h_ad, atol=5e-3, rtol=1e-3), (h_fd, h_ad)


def test_fd_gradient_4d():
    p = PROBLEMS["shekel"]
    x = jnp.asarray([3.0, 3.0, 3.0, 3.0])
    g_fd = fd_gradient(p.fn, x, 1)
    g_ad = jax.grad(p.fn)(x)
    assert jnp.allclose(g_fd, g_ad, atol=1e-6, rtol=1e-5)
