"""Sharded DE over an 8-virtual-device CPU mesh: correctness of the
collective program and agreement with the problem's known optimum."""
import jax
import jax.numpy as jnp
import pytest

from nlsolver_tpu.parallel import make_mesh, minimize_sharded
from nlsolver_tpu.problems import PROBLEMS
from nlsolver_tpu.solvers.de import DEConfig


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8, dp=2, pop=4)


def test_sharded_de_converges(mesh, key):
    p = PROBLEMS["rosenbrock"]
    B = 4
    x0 = jnp.tile(jnp.full((2,), -0.5), (B, 1))
    keys = jax.random.split(key, B)
    cfg = DEConfig(pop_size=48, max_iter=400)
    res = minimize_sharded(p.fn, x0, cfg, mesh, keys)
    assert res.x.shape == (B, 2)
    dists = jax.vmap(p.distance_to_nearest_minimum)(res.x)
    assert float(jnp.max(dists)) <= 0.05, res.x


def test_sharded_pso_converges(mesh, key):
    from nlsolver_tpu.parallel import pso_minimize_sharded
    from nlsolver_tpu.solvers.pso import PSOConfig

    p = PROBLEMS["sphere"]
    B = 4
    x0 = jnp.tile(jnp.full((2,), -0.5), (B, 1))
    keys = jax.random.split(key, B)
    cfg = PSOConfig(n_particles=16, max_iter=500)
    res = pso_minimize_sharded(p.fn, x0, cfg, mesh, keys)
    assert res.x.shape == (B, 2)
    dists = jax.vmap(p.distance_to_nearest_minimum)(res.x)
    assert float(jnp.max(dists)) <= 0.05, res.x


def test_sharded_pso_layout_invariance(key):
    from nlsolver_tpu.parallel import pso_minimize_sharded
    from nlsolver_tpu.solvers.pso import PSOConfig

    p = PROBLEMS["rosenbrock"]
    B = 4
    x0 = jnp.tile(jnp.full((2,), -0.5), (B, 1))
    keys = jax.random.split(key, B)
    cfg = PSOConfig(n_particles=16, max_iter=60, best_value_no_change=1000)
    res_a = pso_minimize_sharded(p.fn, x0, cfg, make_mesh(8, dp=4, pop=2), keys)
    res_b = pso_minimize_sharded(p.fn, x0, cfg, make_mesh(8, dp=2, pop=4), keys)
    assert jnp.allclose(res_a.x, res_b.x, atol=1e-12)


def test_sharded_matches_mesh_layouts(key):
    # layout invariance: (1,8) vs (4,2)... same keys -> same results
    p = PROBLEMS["sphere"]
    B = 4
    x0 = jnp.tile(jnp.full((2,), -0.5), (B, 1))
    keys = jax.random.split(key, B)
    cfg = DEConfig(pop_size=16, max_iter=50, best_value_no_change=1000)
    res_a = minimize_sharded(p.fn, x0, cfg, make_mesh(8, dp=4, pop=2), keys)
    res_b = minimize_sharded(p.fn, x0, cfg, make_mesh(8, dp=2, pop=4), keys)
    assert jnp.allclose(res_a.x, res_b.x, atol=1e-12)
    assert jnp.allclose(res_a.f_value, res_b.f_value, atol=1e-12)


def test_dim_sharded_lbfgs(key):
    # large-n quadratic with cross-shard coupling via the global mean
    from nlsolver_tpu.parallel.lbfgs_sharded import minimize_dim_sharded
    from jax import lax

    mesh = make_mesh(8, dp=1, pop=8)
    n = 1024
    targets = jnp.linspace(-1.0, 1.0, n)

    # f(x) = sum((x - t)^2) + (mean(x))^2  -- the mean couples all shards
    def fn_local(x_loc):
        i = lax.axis_index("pop")
        t_loc = lax.dynamic_slice(targets, (i * (n // 8),), (n // 8,))
        return jnp.sum((x_loc - t_loc) ** 2)

    def grad_local(x_loc):
        i = lax.axis_index("pop")
        t_loc = lax.dynamic_slice(targets, (i * (n // 8),), (n // 8,))
        mean_x = lax.psum(jnp.sum(x_loc), "pop") / n
        return 2.0 * (x_loc - t_loc) + 2.0 * mean_x / n

    # include the coupling term in fn_local's psum contribution: add it on
    # shard 0 only (it is a function of the global mean)
    def fn_local_full(x_loc):
        i = lax.axis_index("pop")
        mean_x = lax.psum(jnp.sum(x_loc), "pop") / n
        base = fn_local(x_loc)
        return base + jnp.where(i == 0, mean_x**2, 0.0)

    res = minimize_dim_sharded(fn_local_full, grad_local, jnp.zeros(n), mesh)
    assert res.x.shape == (n,)
    # analytic optimum: x = t - mean-correction; mean(t)=0 so x* = t
    assert float(jnp.max(jnp.abs(res.x - targets))) < 1e-4
    assert bool(res.converged)


class TestCMAESFleetSharded:
    def test_layout_invariance_and_quality(self, key):
        """The sharded CMA-ES fleet gives IDENTICAL results on (dp,pop) =
        (4,2) and (2,4) meshes (no collectives — pure data parallelism
        over lanes) and solves the problem."""
        import numpy as np

        from nlsolver_tpu.parallel import make_mesh, minimize_fleet_sharded
        from nlsolver_tpu.solvers.cmaes_fleet import CMAESFleetConfig

        rosen = lambda x: 100.0 * (x[0] ** 2 - x[1]) ** 2 + (x[0] - 1.0) ** 2
        B = 16
        X0 = jnp.full((2, B), -0.5, jnp.float32)
        cfg = CMAESFleetConfig(max_iter=150)
        outs = []
        for dp, pop in ((4, 2), (2, 4)):
            mesh = make_mesh(8, dp=dp, pop=pop)
            res = minimize_fleet_sharded(rosen, X0, cfg, mesh, key=key)
            outs.append(np.asarray(res.f_value))
        assert np.array_equal(outs[0], outs[1])
        assert float(np.median(outs[0])) < 1e-4


def test_lane_sharded_bfgs_fleet_layout_invariance():
    """parallel/fleet_sharded.py: the lane-sharded BFGS fleet gives
    bit-identical results across mesh layouts (pure data parallelism —
    the lane axis has no cross-lane data flow)."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from nlsolver_tpu.parallel import bfgs_minimize_fleet_sharded, make_mesh
    from nlsolver_tpu.solvers import bfgs_fleet as bff

    fn_cols = lambda X: jnp.sum((X - 1.5) ** 2, axis=0)
    X0 = jnp.linspace(-1.0, 1.0, 3 * 8, dtype=jnp.float32).reshape(3, 8)
    cfg = bff.BFGSFleetConfig(max_iter=40, grad_eps=1e-6)
    r_a = bfgs_minimize_fleet_sharded(fn_cols, X0, cfg, make_mesh(8, dp=2, pop=4))
    r_b = bfgs_minimize_fleet_sharded(fn_cols, X0, cfg, make_mesh(4, dp=4, pop=1))
    np.testing.assert_array_equal(np.asarray(r_a.x), np.asarray(r_b.x))
    assert float(jnp.max(r_a.f_value)) < 1e-8
    with __import__("pytest").raises(ValueError, match="divide"):
        bfgs_minimize_fleet_sharded(
            fn_cols, jnp.zeros((3, 6)), cfg, make_mesh(8, dp=2, pop=4)
        )


def test_lane_sharded_fit_fleet_matches_unsharded():
    import numpy as np

    import jax
    import jax.numpy as jnp
    from nlsolver_tpu.parallel import fit_fleet_sharded, make_mesh
    from nlsolver_tpu.solvers import nlls_fleet as nf

    B, m = 8, 16
    t = jnp.linspace(0.0, 2.0, m, dtype=jnp.float32)
    amps = jnp.linspace(1.0, 3.0, B, dtype=jnp.float32)
    ys = amps[:, None] * jnp.exp(-1.0 * t)[None, :]
    residual = lambda p, y: p[0] * jnp.exp(-p[1] * t) - y
    cfg = nf.NLLSFleetConfig(max_iter=25)
    X0 = jnp.ones((2, B), jnp.float32)
    sharded = fit_fleet_sharded(residual, X0, cfg, make_mesh(8, dp=2, pop=4), data=ys)
    plain = jax.jit(lambda X: nf.fit_fleet(residual, X, cfg, data=ys))(X0)
    np.testing.assert_allclose(
        np.asarray(sharded.x), np.asarray(plain.x), rtol=1e-6
    )


def test_sharded_pso_single_collective_per_generation(mesh, key):
    """Round-4 collective diet for PSO: the while body carries exactly ONE
    all-gather (the packed candidate+spread block) and the cond's
    all-reduce — no collective-permute, no extra reductions."""
    from nlsolver_tpu.parallel import pso_minimize_sharded
    from nlsolver_tpu.solvers.pso import PSOConfig

    p = PROBLEMS["sphere"]
    B = 4
    x0 = jnp.tile(jnp.full((2,), -0.5), (B, 1))
    keys = jax.random.split(key, B)
    cfg = PSOConfig(n_particles=16, max_iter=40)
    lowered = jax.jit(
        lambda x, k: pso_minimize_sharded(p.fn, x, cfg, mesh, k).x
    ).lower(x0, keys)
    body = lowered.compile().as_text().split("ENTRY")[0]
    assert body.count("all-gather") <= 1, body.count("all-gather")
    assert body.count("collective-permute") == 0


def test_sharded_de_single_gather_per_generation(mesh, key):
    """Round-4 collective diet for the fully-sharded DE: the agent matrix
    and the score vector travel in ONE packed all-gather per generation
    (plus the cond's all-reduce)."""
    p = PROBLEMS["sphere"]
    B = 4
    x0 = jnp.tile(jnp.full((2,), -0.5), (B, 1))
    keys = jax.random.split(key, B)
    cfg = DEConfig(pop_size=32, max_iter=40)
    lowered = jax.jit(
        lambda x, k: minimize_sharded(p.fn, x, cfg, mesh, k).x
    ).lower(x0, keys)
    body = lowered.compile().as_text().split("ENTRY")[0]
    assert body.count("all-gather") <= 1, body.count("all-gather")


def test_lane_sharded_pso_sann_fleet_layout_invariance(key):
    """parallel/fleet_sharded.py round-5 wrappers: the lane-sharded
    PSO/SANN fleets give bit-identical results across mesh layouts
    (per-instance keys, no cross-lane data flow)."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from nlsolver_tpu.parallel import (
        make_mesh,
        minimize_pso_fleet_sharded,
        minimize_sann_fleet_sharded,
    )
    from nlsolver_tpu.problems import PROBLEMS
    from nlsolver_tpu.solvers.pso import PSOConfig
    from nlsolver_tpu.solvers.sann import SANNConfig

    p = PROBLEMS["sphere"]
    B = 8
    x0 = jnp.tile(jnp.full((2,), -0.5, jnp.float32), (B, 1))
    keys = jax.random.split(key, B)
    cfg = PSOConfig(n_particles=8, max_iter=60)
    r_a = minimize_pso_fleet_sharded(
        p.fn, x0, cfg, make_mesh(8, dp=2, pop=4), keys=keys
    )
    r_b = minimize_pso_fleet_sharded(
        p.fn, x0, cfg, make_mesh(8, dp=4, pop=2), keys=keys
    )
    np.testing.assert_array_equal(np.asarray(r_a.x), np.asarray(r_b.x))

    scfg = SANNConfig(max_iter=60)
    s_a = minimize_sann_fleet_sharded(
        p.fn, x0, scfg, make_mesh(8, dp=2, pop=4), keys=keys
    )
    s_b = minimize_sann_fleet_sharded(
        p.fn, x0, scfg, make_mesh(8, dp=4, pop=2), keys=keys
    )
    np.testing.assert_array_equal(np.asarray(s_a.x), np.asarray(s_b.x))
    assert float(jnp.median(s_a.f_value)) < 0.05
