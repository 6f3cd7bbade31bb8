"""bfloat16 objective-evaluation mode (core.objective.with_eval_dtype).

Accuracy study for the ROADMAP item "bfloat16 objective-evaluation mode
with f32 solver state": the wrapper evaluates the objective in bf16 while
every solver-state array stays float32.  The study checks that the batched
DE driver still solves the classical test functions to the reference's
parity tolerance (|dx| <= 0.05, test_functions.h:432) with bf16 scores.
"""
import jax
import jax.numpy as jnp
import pytest

from nlsolver_tpu.core import with_eval_dtype
from nlsolver_tpu.problems import PROBLEMS
from nlsolver_tpu.solvers import de_batched
from nlsolver_tpu.solvers.de import DEConfig


def test_wrapper_dtypes():
    seen = {}

    def fn(x):
        seen["dtype"] = x.dtype
        return jnp.sum(x * x)

    wrapped = with_eval_dtype(fn, jnp.bfloat16)
    out = wrapped(jnp.ones((4,), jnp.float32))
    assert seen["dtype"] == jnp.bfloat16
    assert out.dtype == jnp.float32


def test_wrapper_quantizes_like_bf16():
    fn = lambda x: jnp.sum(x)
    wrapped = with_eval_dtype(fn, jnp.bfloat16)
    x = jnp.asarray([1.0 + 1e-4], jnp.float32)  # below bf16 resolution
    assert float(wrapped(x)) == float(jnp.asarray(1.0 + 1e-4, jnp.bfloat16))


@pytest.mark.parametrize("pname", ["sphere", "rosenbrock", "rastrigin"])
def test_de_batched_bf16_eval_solves_suite(pname, key):
    """DE fleet with bf16 objective scores still lands within the parity
    tolerance; solver state (agents, counters) stays f32 throughout."""
    p = PROBLEMS[pname]
    cfg = DEConfig(
        pop_size=32, max_iter=250, eps=0.0, best_value_no_change=1 << 30,
        partner_sampling="rotation",
    )
    B = 8
    x0 = jnp.tile(jnp.full((p.dim,), -0.5, jnp.float32), (B, 1))
    keys = jax.random.split(key, B)
    fn16 = with_eval_dtype(p.fn, jnp.bfloat16)
    res = jax.jit(
        lambda x0, k: de_batched.minimize_batched(fn16, x0, cfg, keys=k)
    )(x0, keys)
    assert res.x.dtype == jnp.float32
    # majority of the fleet within the reference parity tolerance of a
    # known minimum in parameter space
    dx = jax.vmap(p.distance_to_nearest_minimum)(res.x)
    assert int(jnp.sum(dx <= 0.05)) >= (3 * B) // 4, dx
