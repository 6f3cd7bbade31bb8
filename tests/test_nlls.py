"""Residual-Jacobian LM: single fits, curve fitting, vmapped fleets, and the
dp-sharded multi-host path."""
import jax
import jax.numpy as jnp
import pytest

from nlsolver_tpu.solvers import nlls
from nlsolver_tpu.solvers.nlls import NLLSConfig


def test_linear_fit_exact():
    # r(x) = A x - y has the least-squares solution
    A = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    y = jnp.asarray([7.0, 8.0, 9.0])
    res = jax.jit(lambda x0: nlls.fit(lambda x: A @ x - y, x0))(jnp.zeros(2))
    expect, *_ = jnp.linalg.lstsq(A, y)
    assert jnp.allclose(res.x, expect, atol=1e-6), (res.x, expect)


def test_rosenbrock_as_residuals():
    # rosenbrock = ||(10(x1 - x0^2), 1 - x0)||^2
    r = lambda x: jnp.asarray([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])
    res = jax.jit(lambda x0: nlls.fit(r, x0))(jnp.asarray([-1.2, 1.0]))
    assert jnp.allclose(res.x, jnp.ones(2), atol=1e-6)
    assert float(res.f_value) < 1e-12


def test_exponential_curve_fit(key):
    t = jnp.linspace(0.0, 4.0, 64)
    true_p = jnp.asarray([2.5, 1.3, 0.5])
    model = lambda p, t: p[0] * jnp.exp(-p[1] * t) + p[2]
    y = model(true_p, t) + 0.001 * jax.random.normal(key, t.shape, t.dtype)
    res = jax.jit(lambda p0: nlls.curve_fit(model, t, y, p0))(jnp.asarray([1.0, 1.0, 0.0]))
    assert jnp.allclose(res.x, true_p, atol=0.05), res.x


def test_batched_fleet(key):
    # B instances with different data, fitted in one vmapped program
    B = 64
    t = jnp.linspace(0.0, 1.0, 32)
    ks = jax.random.split(key, 2)
    slopes = jax.random.uniform(ks[0], (B,), minval=0.5, maxval=3.0)
    intercepts = jax.random.uniform(ks[1], (B,), minval=-1.0, maxval=1.0)
    ys = slopes[:, None] * t[None, :] + intercepts[:, None]

    def residual(p, y_i):
        return p[0] * t + p[1] - y_i

    res = jax.jit(
        lambda x0s, ys: nlls.fit_batched(residual, x0s, NLLSConfig(), data=ys)
    )(jnp.zeros((B, 2)), ys)
    assert jnp.allclose(res.x[:, 0], slopes, atol=1e-5)
    assert jnp.allclose(res.x[:, 1], intercepts, atol=1e-5)


def test_sharded_fleet(key):
    from nlsolver_tpu.parallel import make_mesh
    from nlsolver_tpu.parallel.nlls_sharded import fit_sharded

    assert len(jax.devices()) >= 8
    mesh = make_mesh(8, dp=8, pop=1)
    B = 32
    t = jnp.linspace(0.0, 1.0, 16)
    slopes = jax.random.uniform(key, (B,), minval=0.5, maxval=3.0)
    ys = slopes[:, None] * t[None, :]

    def residual(p, y_i):
        return p[0] * t - y_i

    res = fit_sharded(residual, jnp.zeros((B, 1)), nlls.NLLSConfig(), mesh, data=ys)
    assert jnp.allclose(res.x[:, 0], slopes, atol=1e-5)


def test_qr_solve_path_matches_cholesky(key):
    """NLLSConfig(solve="qr"): augmented-system Givens QR step reaches the
    same fits as the damped normal equations on a well-posed problem."""
    from nlsolver_tpu.solvers import nlls

    B, m = 64, 24
    t = jnp.linspace(0.0, 2.0, m, dtype=jnp.float64)
    k1, k2 = jax.random.split(key)
    amps = jax.random.uniform(k1, (B,), jnp.float64, 1.0, 3.0)
    rates = jax.random.uniform(k2, (B,), jnp.float64, 0.5, 2.0)
    ys = amps[:, None] * jnp.exp(-rates[:, None] * t[None, :])

    def residual(p, y_i):
        return p[0] * jnp.exp(-p[1] * t) - y_i

    x0 = jnp.ones((B, 2), jnp.float64)
    fits = {}
    for solve in ("cholesky", "qr"):
        cfg = nlls.NLLSConfig(max_iter=40, solve=solve)
        res = jax.jit(
            lambda x0: nlls.fit_batched(residual, x0, cfg, data=ys)
        )(x0)
        assert float(jnp.max(res.f_value)) < 1e-10, solve
        fits[solve] = res.x
    assert jnp.allclose(fits["qr"], fits["cholesky"], atol=1e-6)
