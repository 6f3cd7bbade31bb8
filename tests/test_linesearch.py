"""Line searches: Wolfe conditions on quadratics and hard directions."""
import jax
import jax.numpy as jnp

from nlsolver_tpu.linesearch import armijo, more_thuente
from nlsolver_tpu.linesearch.more_thuente import FTOL, GTOL


def quad(x):
    return 0.5 * jnp.sum(x * x)


def test_more_thuente_exact_on_quadratic():
    # phi(a) = 0.5 ||x - a x||^2, minimizer at a = 1 for d = -x
    x = jnp.asarray([2.0, -3.0])
    g = jax.grad(quad)(x)
    d = -g
    res = more_thuente(quad, jax.grad(quad), x, quad(x), g, d, 1.0)
    assert res.info == 1
    # strong Wolfe holds
    a = res.alpha
    f_new = quad(x + a * d)
    g_new = jax.grad(quad)(x + a * d)
    dginit = jnp.dot(g, d)
    assert float(f_new) <= float(quad(x) + FTOL * a * dginit)
    assert float(jnp.abs(jnp.dot(g_new, d))) <= float(GTOL * (-dginit))


def test_more_thuente_rosenbrock_direction():
    from nlsolver_tpu.problems import PROBLEMS

    fn = PROBLEMS["rosenbrock"].fn
    x = jnp.asarray([-0.5, -0.5])
    g = jax.grad(fn)(x)
    d = -g
    res = more_thuente(fn, jax.grad(fn), x, fn(x), g, d, 1.0)
    assert int(res.info) >= 1  # terminated with some MINPACK code
    assert float(fn(x + res.alpha * d)) < float(fn(x))  # made progress
    assert int(res.nfev) <= 20


def test_more_thuente_nondescent_returns_initial_alpha():
    x = jnp.asarray([1.0, 1.0])
    g = jax.grad(quad)(x)
    res = more_thuente(quad, jax.grad(quad), x, quad(x), g, g, 0.7)  # ascent dir
    assert float(res.alpha) == 0.7
    assert int(res.info) == -1


def test_armijo_backtracks():
    x = jnp.asarray([2.0, -3.0])
    g = jax.grad(quad)(x)
    d = -g
    res = armijo(quad, x, quad(x), g, d, 4.0)  # alpha=4 overshoots badly
    a = float(res.alpha)
    assert a < 4.0
    assert float(quad(x + a * d)) <= float(quad(x) + 0.2 * a * jnp.dot(g, d))


def test_vmapped_linesearch():
    # batch of line searches in one program — the TPU-batched BFGS building block
    xs = jnp.stack([jnp.asarray([2.0, -3.0]), jnp.asarray([1.0, 5.0])])
    gs = jax.vmap(jax.grad(quad))(xs)
    res = jax.vmap(
        lambda x, g: more_thuente(quad, jax.grad(quad), x, quad(x), g, -g, 1.0)
    )(xs, gs)
    assert res.alpha.shape == (2,)
    assert bool(jnp.all(res.info == 1))
