"""CMA-ES: a real implementation (the reference's is a non-compiling
skeleton) — convergence on smooth + multimodal problems and in higher dims."""
import jax
import jax.numpy as jnp
import pytest

from nlsolver_tpu.problems import PROBLEMS
from nlsolver_tpu.solvers import cmaes
from nlsolver_tpu.solvers.cmaes import CMAESConfig

from helpers import solve, start_point

TOL = 0.05


@pytest.mark.parametrize(
    "name", ["sphere", "rosenbrock", "booth", "matyas", "beale", "mccormick"]
)
def test_converges_smooth(name, key):
    p = PROBLEMS[name]
    res = solve(cmaes, p.fn, start_point(p), CMAESConfig(), key=key)
    dist = float(p.distance_to_nearest_minimum(res.x))
    assert dist <= TOL, (name, res.x, dist)


def test_rastrigin_with_large_population(key):
    p = PROBLEMS["rastrigin"]
    cfg = CMAESConfig(pop_size=64, sigma0=2.0, max_iter=400)
    keys = jax.random.split(key, 8)
    res = jax.jit(
        jax.vmap(lambda k: cmaes.minimize(p.fn, start_point(p), cfg, key=k))
    )(keys)
    dists = jax.vmap(p.distance_to_nearest_minimum)(res.x)
    assert int(jnp.sum(dists <= TOL)) >= 5


def test_10d_sphere(key):
    fn = lambda x: jnp.sum(x * x)
    res = solve(cmaes, fn, jnp.full((10,), 2.0, jnp.float64), CMAESConfig(max_iter=1000), key=key)
    assert float(res.f_value) < 1e-8


def test_10d_rosenbrock(key):
    p = PROBLEMS["rosenbrock"]
    x0 = jnp.full((10,), -0.5, jnp.float64)
    res = solve(cmaes, p.fn, x0, CMAESConfig(max_iter=3000, best_value_no_change=200), key=key)
    assert float(res.f_value) < 1e-6, float(res.f_value)


def test_shekel_4d(key):
    # all 22 reference configs fail Shekel (BASELINE.md); CMA-ES with restarts
    # of sigma cracks it from the same start point
    p = PROBLEMS["shekel"]
    cfg = CMAESConfig(sigma0=3.0, pop_size=64, max_iter=500)
    keys = jax.random.split(key, 8)
    res = jax.jit(
        jax.vmap(lambda k: cmaes.minimize(p.fn, start_point(p), cfg, key=k))
    )(keys)
    dists = jax.vmap(p.distance_to_nearest_minimum)(res.x)
    assert int(jnp.sum(dists <= TOL)) >= 4, jnp.round(dists, 3)


def test_bounded_mccormick_in_box(key):
    """CMA-ES honors bounds by projection repair: every candidate is clamped
    before evaluation, so iterates stay in the box even when the global
    minimum (-0.547, -1.547) lies outside it.  The box holds two candidate
    optima: the (0, 0) corner (f = 1) and the interior local minimum at
    (1 + pi/3 - ..., ...) ~ (2.594, 1.594) (f ~ 1.228); either is a
    feasible answer, anything better than 1.25 proves no out-of-box leak
    (outside, f drops below -1.9)."""
    from nlsolver_tpu.core import Bounds

    p = PROBLEMS["mccormick"]
    bounds = Bounds(lower=jnp.asarray([0.0, 0.0]), upper=jnp.asarray([4.0, 4.0]))
    cfg = CMAESConfig(max_iter=300)
    res = jax.jit(
        lambda k: cmaes.minimize(p.fn, jnp.asarray([2.0, 2.0]), cfg,
                                 bounds=bounds, key=k)
    )(key)
    assert float(res.x[0]) >= -1e-9 and float(res.x[1]) >= -1e-9
    assert float(res.x[0]) <= 4.0 + 1e-9 and float(res.x[1]) <= 4.0 + 1e-9
    assert float(res.f_value) <= 1.25, (res.x, res.f_value)
    # a start outside the box is repaired into it
    res2 = cmaes.minimize(p.fn, jnp.asarray([-3.0, -3.0]), cfg,
                          bounds=bounds, key=key)
    assert float(res2.x[0]) >= -1e-9 and float(res2.x[1]) >= -1e-9


def test_bounded_constrained_optimum_on_face(key):
    """Shifted sphere with its minimum outside the box: the constrained
    optimum is the nearest box corner and projection repair must find it."""
    from nlsolver_tpu.core import Bounds

    fn = lambda x: jnp.sum((x + 1.0) ** 2)
    bounds = Bounds(lower=jnp.zeros(2), upper=jnp.full(2, 4.0))
    res = cmaes.minimize(fn, jnp.asarray([2.0, 2.0]),
                         CMAESConfig(max_iter=300), bounds=bounds, key=key)
    assert float(jnp.max(jnp.abs(res.x))) <= 1e-3, res.x
    assert abs(float(res.f_value) - 2.0) < 1e-2


def test_restart_variance_kick(key):
    """Reference intent nlsolver.h:4566-4568: on a dead-flat landscape the
    top-mu costs collapse, the best value stagnates, and after
    kick_patience generations sigma is re-inflated by exp(0.2 + cs/damps)
    per generation — deterministic exponential growth, vs the slow CSA
    random walk without the kick."""
    fn = lambda x: jnp.asarray(0.0, x.dtype)    # constant: pure plateau

    def run_sigma(kick_tol):
        cfg = CMAESConfig(sigma0=1e-6, max_iter=10_000,
                          best_value_no_change=10_000, kick_tol=kick_tol)
        state = cmaes.init(fn, jnp.zeros(2, jnp.float64), cfg, key)
        step = jax.jit(lambda s: cmaes.step(fn, s, cfg))
        for _ in range(80):
            state = step(state)
        return float(state.sigma)

    sigma_kicked = run_sigma(1e-6)
    sigma_plain = run_sigma(0.0)
    # 70 kicking generations at >= exp(0.2) each is > e^14 ~ 1e6 growth
    assert sigma_kicked > 1e3 * 1e-6, sigma_kicked
    assert sigma_kicked > 100.0 * sigma_plain, (sigma_kicked, sigma_plain)


def test_jacobi_eigh_backend(key):
    """CMAESConfig(eigh_method='jacobi') solves as well as the XLA eigh
    (the switch exists for vmapped batches, where XLA's batched eigh is
    the many-small-matrix worst case)."""
    from nlsolver_tpu.solvers import cmaes

    rosen = lambda x: 100.0 * (x[0] ** 2 - x[1]) ** 2 + (x[0] - 1.0) ** 2
    x0 = jnp.asarray([-0.5, -0.5])
    for method in ("xla", "jacobi"):
        cfg = cmaes.CMAESConfig(max_iter=300, eigh_method=method)
        res = jax.jit(lambda x, k: cmaes.minimize(rosen, x, cfg, key=k))(
            x0, key
        )
        assert float(res.f_value) < 1e-8, method


def test_ipop_beats_single_run_on_multimodal():
    """IPOP-CMA-ES (Auger & Hansen 2005; PAPERS.md arXiv:2409.11765):
    increasing-population restarts escape the local minimum the single
    run stalls in, with counters summed across stages."""
    import jax
    import jax.numpy as jnp

    from nlsolver_tpu.problems import PROBLEMS
    from nlsolver_tpu.solvers import cmaes

    p = PROBLEMS["rastrigin"]
    x0 = jnp.full((8,), 3.5, jnp.float32)
    cfg = cmaes.CMAESConfig(max_iter=400)
    single = cmaes.minimize(p.fn, x0, cfg, key=jax.random.key(3))
    ipop = cmaes.minimize_ipop(
        p.fn, x0, cfg, key=jax.random.key(3), max_restarts=3
    )
    assert float(ipop.f_value) < float(single.f_value)
    assert int(ipop.function_calls) > int(single.function_calls)

    # max_restarts=0 degenerates to a single (keyed) run
    zero = cmaes.minimize_ipop(
        p.fn, x0, cfg, key=jax.random.key(3), max_restarts=0
    )
    assert zero.x.shape == x0.shape


def test_ipop_solves_shekel():
    """The reference-unsolvable Shekel falls to increasing-population
    restarts (complementing the multistart meta-driver)."""
    import jax
    import jax.numpy as jnp

    from nlsolver_tpu.problems import PROBLEMS
    from nlsolver_tpu.solvers import cmaes

    p = PROBLEMS["shekel"]
    r = cmaes.minimize_ipop(
        p.fn, jnp.full((4,), -0.5), cmaes.CMAESConfig(max_iter=300),
        key=jax.random.key(0), max_restarts=4,
    )
    assert float(p.distance_to_nearest_minimum(r.x)) <= 0.05


def test_ipop_nan_stage_does_not_stick():
    """Regression (round-4 review): a NaN stage-0 result must not defeat
    every later finite restart."""
    from nlsolver_tpu.solvers import cmaes

    def sometimes_nan(x):
        # NaN basin around the origin start; finite bowl elsewhere
        base = jnp.sum((x - 2.0) ** 2)
        return jnp.where(jnp.sum(x * x) < 0.5, jnp.nan, base)

    r = cmaes.minimize_ipop(
        sometimes_nan, jnp.zeros(2), cmaes.CMAESConfig(max_iter=100),
        key=jax.random.key(0), max_restarts=3,
    )
    assert bool(jnp.isfinite(r.f_value))
