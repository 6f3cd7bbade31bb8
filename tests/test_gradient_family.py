"""GD / CGD / BFGS / LM convergence, including the reference pass-matrix
pairs for the configs its harness tests (BFGS, CGD, GD-linesearch,
GD-anneal), from x0=(-0.5,...) at |dx|<=0.05."""
import jax
import jax.numpy as jnp
import pytest

from nlsolver_tpu.problems import PROBLEMS
from nlsolver_tpu.solvers import bfgs, cgd, gd, lm
from nlsolver_tpu.solvers.bfgs import BFGSConfig
from nlsolver_tpu.solvers.cgd import CGDConfig
from nlsolver_tpu.solvers.gd import GDConfig
from nlsolver_tpu.solvers.lm import LMConfig

from helpers import solve, start_point
from reference_matrix import passes

TOL = 0.05

BFGS_PASSES = passes("bfgs")
CGD_PASSES = passes("cgd")
GD_LS_PASSES = passes("gd_linesearch")
GD_AN_PASSES = passes("gd_anneal")


@pytest.mark.parametrize("name", BFGS_PASSES)
def test_bfgs_converges(name):
    p = PROBLEMS[name]
    res = solve(bfgs, p.fn, start_point(p), BFGSConfig())
    dist = float(p.distance_to_nearest_minimum(res.x))
    assert dist <= TOL, (name, res.x, dist)


@pytest.mark.parametrize("name", CGD_PASSES)
def test_cgd_converges(name):
    p = PROBLEMS[name]
    res = solve(cgd, p.fn, start_point(p), CGDConfig())
    dist = float(p.distance_to_nearest_minimum(res.x))
    assert dist <= TOL, (name, res.x, dist)


@pytest.mark.parametrize("name", GD_LS_PASSES)
def test_gd_linesearch_converges(name):
    p = PROBLEMS[name]
    res = solve(gd, p.fn, start_point(p), GDConfig(step_type="linesearch"))
    dist = float(p.distance_to_nearest_minimum(res.x))
    assert dist <= TOL, (name, res.x, dist)


@pytest.mark.parametrize("name", GD_AN_PASSES)
def test_gd_anneal_converges(name):
    p = PROBLEMS[name]
    res = solve(gd, p.fn, start_point(p), GDConfig(step_type="anneal"))
    dist = float(p.distance_to_nearest_minimum(res.x))
    assert dist <= TOL, (name, res.x, dist)


def test_gd_anneal_safeguarded():
    """The NON-DEFAULT variant="safeguarded" anneal (round-4 verdict #6):
    gradient-norm-guarded steps converge where the reference schedule
    diverges (booth explodes to ~1e150 under the default — PARITY.md),
    and the default variant's reference semantics stay untouched."""
    import jax.numpy as jnp

    p = PROBLEMS["booth"]
    res_sg = solve(
        gd, p.fn, start_point(p),
        GDConfig(step_type="anneal", variant="safeguarded", max_iter=5000),
    )
    assert float(p.distance_to_nearest_minimum(res_sg.x)) <= 0.2, res_sg.x
    res_def = solve(gd, p.fn, start_point(p), GDConfig(step_type="anneal"))
    assert not bool(
        jnp.all(jnp.isfinite(res_def.x))
    ) or float(p.fn(res_def.x)) > 1e3  # the reference schedule still diverges


def test_gd_fixed_on_sphere():
    p = PROBLEMS["sphere"]
    res = solve(gd, p.fn, start_point(p), GDConfig(step_type="fixed", alpha=0.1))
    assert float(p.distance_to_nearest_minimum(res.x)) <= TOL


def test_gd_bigstep_on_sphere_and_booth():
    for name in ("sphere", "booth"):
        p = PROBLEMS[name]
        res = solve(gd, p.fn, start_point(p), GDConfig(step_type="bigstep", alpha=0.1))
        assert float(p.distance_to_nearest_minimum(res.x)) <= TOL, name


def test_gd_page_on_sphere():
    p = PROBLEMS["sphere"]
    res = solve(gd, p.fn, start_point(p), GDConfig(step_type="page", alpha=0.05))
    assert float(p.distance_to_nearest_minimum(res.x)) <= TOL


def test_bfgs_fd_parity_mode():
    # FD derivative provider must converge like autodiff and burn 4n evals/grad
    from nlsolver_tpu.deriv import Deriv

    p = PROBLEMS["rosenbrock"]
    res_ad = solve(bfgs, p.fn, start_point(p), BFGSConfig())
    res_fd = solve(bfgs, p.fn, start_point(p), BFGSConfig(deriv=Deriv(mode="fd")))
    assert float(p.distance_to_nearest_minimum(res_fd.x)) <= TOL
    assert int(res_fd.function_calls) > int(res_ad.function_calls)


def test_lm_converges_smooth():
    for name in ("sphere", "booth", "rosenbrock", "matyas"):
        p = PROBLEMS[name]
        res = solve(lm, p.fn, start_point(p), LMConfig())
        assert float(p.distance_to_nearest_minimum(res.x)) <= TOL, (
            name,
            res.x,
        )


def test_lm_counters():
    p = PROBLEMS["sphere"]
    res = solve(lm, p.fn, start_point(p), LMConfig())
    assert int(res.hessian_calls) >= 1
    assert int(res.gradient_calls) >= 1


def test_bfgs_vmap_batch():
    p = PROBLEMS["rosenbrock"]
    cfg = BFGSConfig()
    starts = jnp.stack([start_point(p) + 0.05 * i for i in range(8)])
    res = jax.jit(jax.vmap(lambda x0: bfgs.minimize(p.fn, x0, cfg)))(starts)
    dists = jax.vmap(p.distance_to_nearest_minimum)(res.x)
    assert float(jnp.max(dists)) <= TOL


def test_maximize_gradient_family():
    neg_sphere = lambda x: -jnp.sum(x * x)
    res = jax.jit(lambda x0: bfgs.maximize(neg_sphere, x0))(jnp.asarray([1.0, -2.0]))
    assert float(res.f_value) > -1e-4
