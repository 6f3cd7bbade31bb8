"""Trajectory-level parity against the reference binary.

Golden data: tests/data/reference_trajectories.tsv (tools/traj_probe.cpp run
against /root/reference/nlsolver.h with ``g++ -O2 -DNO_MANUAL_VECTORIZATION``)
records, for each deterministic (solver, problem) pair and every prefix
length k, where the reference lands when run with ``max_iter=k`` from the
canonical start point.  We re-run the same prefixes with reference-parity
flags and compare iterates, f-values, and the iteration/function-call
counters.

Parity classes (all measured, see each table below):

* **Bit-exact x** — Nelder-Mead (all 30 prefixes x 3 problems), the Brent
  minimizer, and the bracketing root finders.  These algorithms only
  multiply by powers of two (alpha=1, gamma=2, rho/sigma=0.5, bisection
  midpoints) or compare f-values, so they are immune to the one platform
  difference we cannot remove (below).  Also bit-exact: the STOCHASTIC
  families, replayed draw-for-draw on the bit-parity reference RNGs —
  DE (4 configs; data-dependent rejection-sampling draw counts,
  in-generation greedy replacement; solvers/de_reference.py), SANN
  (truncated-pi Box-Muller, short-circuit Metropolis draw;
  solvers/sann_reference.py), and Accelerated PSO
  (solvers/pso_reference.py), and the NelderMead-PSO hybrid
  (solvers/nmpso_reference.py: lost vertex-n init write, velocity-copy
  bug, stale best_val counter, order_flip pairwise-best).
  Vanilla PSO is deliberately absent: its
  velocity update reads swarm_best_position[particle_index] out of
  bounds (nlsolver.h:2674), so the reference's own trajectories there
  are allocator-dependent undefined behavior.

* **Counter-exact, x within documented drift** — the FD-gradient solvers
  (GD x5 incl. the divergent PAGE mode, CGD, BFGS, LM).  Root cause of the drift, verified in isolation:
  XLA:CPU contracts ``a*b + c`` into FMA while the golden probe binary
  (plain ``-O2``, baseline x86-64, no FMA ISA) cannot, so objective
  evaluations differ by ~1 ulp at arbitrary points.  The reference's FD
  stencils divide those evaluations by eps ~ 2.2e-8 (nlsolver.h:1389), so a
  1-ulp f difference becomes a ~1e-8 relative gradient difference at the
  very first iteration; iteration counts and f-eval counters still match
  exactly, and the iterate drift stays at the measured levels except where
  the underlying dynamics are chaotic (CGD on Rosenbrock's curved valley,
  where linesearch branch flips amplify 1e-10 to 1e-2 over 30 iterations —
  the reference binary is equally sensitive to its own compile flags there).

Everything here runs in f64 on CPU (conftest).
"""
import pytest

from trajectory_common import compare_pair, load_golden


@pytest.fixture(scope="module")
def golden():
    return load_golden()


# (solver, problem) -> (dx tolerance, max k for the dx assertion or None)
# Tolerances are measured max drift x ~10 headroom; None = all recorded ks.
DX_TOL = {
    ("nm", "booth"): (0.0, None),
    ("nm", "mccormick"): (0.0, None),
    ("nm", "rosenbrock"): (0.0, None),
    ("brent_min", "quartic1d"): (0.0, None),
    ("root_bisection", "cubic"): (0.0, None),
    ("root_brent", "cubic"): (0.0, None),
    ("root_chandrupatla", "cubic"): (0.0, None),
    ("root_itp", "cubic"): (0.0, None),
    ("root_ridders", "cubic"): (0.0, None),
    ("root_tiruneh", "cubic"): (0.0, None),
    # 1 ulp: the reference's val_b=mid quirk stores a coordinate in a
    # value slot; reproducing it still leaves one contraction-prone divide
    ("root_false_position", "cubic"): (5e-15, None),
    ("gd_fixed", "booth"): (1e-6, None),
    ("gd_fixed", "rosenbrock"): (1e-7, None),
    ("gd_anneal", "booth"): (1e-6, None),
    ("gd_anneal", "rosenbrock"): (1e-7, None),
    ("gd_bigstep", "booth"): (1e-6, None),
    ("gd_bigstep", "rosenbrock"): (1e-6, None),
    ("gd_linesearch", "booth"): (1e-4, None),
    # PAGE: the compounding alpha_ *= f_multiplier quirk (nlsolver.h:3014)
    # alternates descent/ascent, and with the always-on gradient correction
    # (p = 0 by size_t division) the iterates blow up doubly-exponentially
    # (booth reaches ~1e100 by k=20 in the golden data).  The ~1e-9 FD
    # gradient noise amplifies accordingly, so only a short prefix is
    # dx-comparable; iteration/f-eval counters match for all 30 prefixes.
    ("gd_page", "booth"): (1e-3, 3),
    ("gd_page", "rosenbrock"): (1e-8, 3),
    ("gd_linesearch", "mccormick"): (1e-6, None),
    ("gd_linesearch", "rosenbrock"): (1e-5, None),
    ("cgd", "booth"): (1e-6, None),
    # chaotic: ~1e-10 drift at k<=8 doubles every iteration once the
    # Armijo step-halving count flips; assert the tight prefix only
    ("cgd", "rosenbrock"): (1e-6, 12),
    ("bfgs", "booth"): (1e-4, None),
    ("bfgs", "mccormick"): (1e-6, None),
    ("bfgs", "rosenbrock"): (1e-5, None),
    ("lm", "booth"): (1e-6, None),
    ("lm", "rosenbrock"): (1e-6, None),
    # stochastic family: DE replayed draw-for-draw on the bit-parity
    # reference RNGs (solvers/de_reference.py) — bit-exact iterates.
    # (Stored scores may carry 1-ulp objective-eval noise, but no accept
    # or best-scan decision flips on these trajectories.)
    ("de_rand_xorshift", "rosenbrock"): (0.0, None),
    ("de_rand_xorshift", "booth"): (0.0, None),
    ("de_best_xorshift", "rosenbrock"): (0.0, None),
    ("de_rand_xoshiro", "rosenbrock"): (0.0, None),
    ("de_rand_recurrent", "rosenbrock"): (0.0, None),
    ("de_rand_recurrent", "booth"): (0.0, None),
    ("de_rand_halton", "rosenbrock"): (0.0, None),
    ("de_rand_halton", "booth"): (0.0, None),
    ("de_rand_mt", "rosenbrock"): (0.0, None),
    ("de_rand_mt", "booth"): (0.0, None),
    ("sann_xoshiro", "rosenbrock"): (0.0, None),
    ("sann_recurrent", "rosenbrock"): (0.0, None),
    ("pso_acc_xoshiro", "rosenbrock"): (0.0, None),
    ("nmpso_xoshiro", "rosenbrock"): (0.0, None),
    ("sann_xorshift", "rosenbrock"): (0.0, None),
    ("sann_xorshift", "booth"): (0.0, None),
    ("pso_acc_xorshift", "rosenbrock"): (0.0, None),
    ("pso_acc_xorshift", "booth"): (0.0, None),
    ("nmpso_xorshift", "rosenbrock"): (0.0, None),
    ("nmpso_xorshift", "booth"): (0.0, None),
}

# pairs where the per-k f-eval counters are allowed to diverge past some k:
# by then the iterates sit at the ~1e-8 gradient-noise floor (or, for CGD,
# have diverged chaotically), where More-Thuente trial counts flip on 1-ulp
# differences.  Iteration counts still match everywhere.
NFEV_EXEMPT_AFTER = {
    ("cgd", "rosenbrock"): 21,
    ("gd_linesearch", "mccormick"): 14,
    ("gd_linesearch", "rosenbrock"): 26,
}

PAIRS = sorted(DX_TOL)


def test_golden_covers_all_pairs(golden):
    assert sorted(golden) == PAIRS


@pytest.mark.parametrize("solver,problem", PAIRS,
                         ids=[f"{s}-{p}" for s, p in PAIRS])
def test_trajectory(golden, solver, problem):
    rows = golden[(solver, problem)]
    per_k = compare_pair(solver, problem, rows)
    tol, max_k = DX_TOL[(solver, problem)]
    nfev_after = NFEV_EXEMPT_AFTER.get((solver, problem))
    bad = []
    for r in per_k:
        if not r["iters_match"]:
            bad.append(f"k={r['k']}: iteration counter mismatch")
        if not r["nfev_match"] and (nfev_after is None or r["k"] <= nfev_after):
            bad.append(f"k={r['k']}: nfev counter mismatch")
        if (max_k is None or r["k"] <= max_k) and not r["dx"] <= tol:
            bad.append(f"k={r['k']}: dx={r['dx']:.3e} > {tol:g}")
    assert not bad, f"{solver}/{problem}: " + "; ".join(bad[:8])


def test_exact_pair_count(golden):
    """The 30 bit-exact pairs (power-of-two-arithmetic deterministic
    solvers + the draw-for-draw DE/SANN/PSO replays across all five
    reference RNG streams + the registered-mt19937 interop) must stay
    bit-exact: a regression that breaks exactness (e.g. reordering the NM
    centroid accumulation, nlsolver.h:1965-1984, or losing the DE donor
    decontraction) shows up here even if it stays under some tolerance."""
    n_exact_pairs = sum(1 for pair, (tol, _) in DX_TOL.items() if tol == 0.0)
    assert n_exact_pairs == 30
