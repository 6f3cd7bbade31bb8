"""Fused-generation Pallas kernel (interpret mode on CPU): correct greedy
selection and convergence over generations."""
import jax
import jax.numpy as jnp
import pytest

from nlsolver_tpu.ops.de_fused import de_generation_fused
from nlsolver_tpu.problems import PROBLEMS


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pltpu.prng_seed has no CPU interpret-mode lowering",
)
def test_fused_generation_improves(key):
    fn = PROBLEMS["sphere"].fn
    B, dim, P = 32, 4, 16
    agents = (jax.random.uniform(key, (B, dim, P), jnp.float32) - 0.5) * 2.0
    scores = jax.vmap(jax.vmap(fn, in_axes=1))(agents)
    best0 = jnp.min(scores, axis=1)

    A, s = agents, scores
    for i in range(30):
        offs = jnp.asarray([1 + i % 5, 6 + i % 5, 11 + i % 4], jnp.int32)
        A, s = de_generation_fused(fn, A, s, i, offs, tile=32)
        # greedy selection: scores never worsen
        assert bool(jnp.all(jnp.min(s, axis=1) <= best0 + 1e-6))
    best30 = jnp.min(s, axis=1)
    # strict improvement on at least most instances
    assert int(jnp.sum(best30 < best0)) >= 28
    # scores stay consistent with agents
    rescored = jax.vmap(jax.vmap(fn, in_axes=1))(A)
    assert jnp.allclose(rescored, s, atol=1e-5)
