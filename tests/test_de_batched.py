"""Column-major fused batched DE: semantics match the row driver's
guarantees; both partner samplings converge; rbg keys work."""
import jax
import jax.numpy as jnp
import pytest

from nlsolver_tpu.problems import PROBLEMS
from nlsolver_tpu.solvers import de_batched
from nlsolver_tpu.solvers.de import DEConfig

TOL = 0.05


@pytest.mark.parametrize("sampling", ["uniform", "rotation"])
@pytest.mark.parametrize("strategy", ["random", "best"])
def test_converges(sampling, strategy, key):
    p = PROBLEMS["rosenbrock"]
    cfg = DEConfig(strategy=strategy, partner_sampling=sampling)
    B = 16
    x0 = jnp.tile(jnp.full((2,), -0.5), (B, 1))
    keys = jax.random.split(key, B)
    res = jax.jit(
        lambda x0, k: de_batched.minimize_batched(p.fn, x0, cfg, keys=k)
    )(x0, keys)
    dists = jax.vmap(p.distance_to_nearest_minimum)(res.x)
    assert int(jnp.sum(dists <= TOL)) >= 14, dists


def test_rbg_keys(key):
    p = PROBLEMS["sphere"]
    B = 8
    x0 = jnp.tile(jnp.full((2,), -0.5), (B, 1))
    keys = jax.random.split(jax.random.key(0, impl="rbg"), B)
    res = jax.jit(
        lambda x0, k: de_batched.minimize_batched(p.fn, x0, DEConfig(), keys=k)
    )(x0, keys)
    dists = jax.vmap(p.distance_to_nearest_minimum)(res.x)
    assert int(jnp.sum(dists <= TOL)) == B


def test_greedy_monotone(key):
    p = PROBLEMS["rastrigin"]
    cfg = DEConfig(max_iter=50)
    B = 4
    x0 = jnp.tile(jnp.full((2,), -0.5), (B, 1))
    keys = jax.random.split(key, B)
    state = de_batched.init(p.fn, x0, cfg, keys)
    step = jax.jit(lambda s: de_batched.step(p.fn, s, cfg))
    prev = jnp.min(state.scores, axis=1)
    for _ in range(15):
        state = step(state)
        cur = jnp.min(state.scores, axis=1)
        assert bool(jnp.all(cur <= prev + 1e-12))
        prev = cur


def test_mixed_termination_lanes(key):
    # instances terminate at different generations; frozen lanes stay put
    p = PROBLEMS["sphere"]
    cfg = DEConfig(max_iter=100, eps=1e-2)
    B = 8
    x0 = jnp.tile(jnp.full((2,), -0.5), (B, 1))
    keys = jax.random.split(key, B)
    res = jax.jit(
        lambda x0, k: de_batched.minimize_batched(p.fn, x0, cfg, keys=k)
    )(x0, keys)
    assert bool(jnp.all(res.iterations <= 100))
    assert bool(jnp.all(res.converged | (res.iterations == 100)))


def test_fused_flag_requires_rotation(key):
    cfg = DEConfig(max_iter=5, use_fused_kernel=True)  # partner_sampling="uniform"
    x0 = jnp.tile(jnp.full((2,), -0.5), (4, 1))
    keys = jax.random.split(key, 4)
    state = de_batched.init(PROBLEMS["sphere"].fn, x0, cfg, keys)
    with pytest.raises(ValueError, match="rotation"):
        de_batched.step(PROBLEMS["sphere"].fn, state, cfg)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="fused DE kernel needs pltpu.prng_seed (no CPU lowering)",
)
def test_fused_flag_end_to_end(key):
    # the fused-kernel driver must solve the same fleet the XLA path does
    p = PROBLEMS["sphere"]
    cfg = DEConfig(
        max_iter=150, pop_size=32, partner_sampling="rotation",
        use_fused_kernel=True, eps=0.0, best_value_no_change=1 << 30,
    )
    B = 64
    x0 = jnp.tile(jnp.full((4,), -0.5), (B, 1))
    keys = jax.random.split(key, B)
    res = jax.jit(
        lambda x0, k: de_batched.minimize_batched(p.fn, x0, cfg, keys=k)
    )(x0, keys)
    assert float(jnp.max(res.f_value)) < 1e-3
