// Trajectory ground-truth probe for nlsolver_tpu parity tests.
//
// This file is OUR code; it compiles against the read-only reference header
// (it is never built inside the repo tree):
//
//   g++ -std=c++17 -O2 -DNO_MANUAL_VECTORIZATION -I/root/reference \
//       -o /tmp/traj_probe tools/traj_probe.cpp
//   /tmp/traj_probe > tests/data/reference_trajectories.tsv
//
// For each deterministic (solver, problem) pair and each k = 1..K it runs a
// fresh reference solver with max_iter=k from the canonical start point and
// prints one TSV row (full %.17g precision):
//
//   solver <TAB> problem <TAB> k <TAB> f_value <TAB> iters <TAB> nfev
//          <TAB> gfev <TAB> hfev <TAB> x0 [<TAB> x1 ...]
//
// i.e. the k-th point of the reference trajectory.  The matching parity test
// (tests/test_trajectory_parity.py) runs our solvers the same way — same
// start, same hyperparameters, reference-quirk flags on, FD derivatives
// accuracy=1 (the reference default fin_diff/fin_diff_h adapters,
// nlsolver.h:2848-2863) — and must land on the same points.
//
// The objective formulas below are transcribed operation-for-operation from
// nlsolver_tpu/problems/test_functions.py so both sides evaluate bit-equal
// f64 objectives.
#include <array>
#include <cmath>
#include <cstdio>
#include <random>
#include <string>
#include <vector>

#include "nlsolver.h"

using vec = std::vector<double>;

// ---------------- problems ----------------
struct Rosenbrock {  // 100(x0^2-x1)^2 + (x0-1)^2
  double operator()(vec &x) {
    const double p = x[0] * x[0] - x[1];
    const double q = x[0] - 1.0;
    return 100.0 * (p * p) + q * q;
  }
};
struct Booth {  // (x0+2x1-7)^2 + (2x0+x1-5)^2
  double operator()(vec &x) {
    const double p = x[0] + 2.0 * x[1] - 7.0;
    const double q = 2.0 * x[0] + x[1] - 5.0;
    return p * p + q * q;
  }
};
struct McCormick {  // sin(x0+x1) + (x0-x1)^2 - 1.5 x0 + 2.5 x1 + 1
  double operator()(vec &x) {
    const double d = x[0] - x[1];
    return std::sin(x[0] + x[1]) + d * d - 1.5 * x[0] + 2.5 * x[1] + 1.0;
  }
};
// 1-D objectives for Brent / root finders
static double quartic1d(double x) {  // min near x ~ -1.30084
  return ((x * x) * (x * x)) - 3.0 * (x * x) + x;
}
static double cubic_root(double x) {  // root at ~2.0945514815423265
  return x * x * x - 2.0 * x - 5.0;
}
struct Quartic1D {
  double operator()(double x) { return quartic1d(x); }
};
struct CubicRoot {
  double operator()(double x) { return cubic_root(x); }
};

// User-RNG interop oracle: std::mt19937(42) through libstdc++'s
// uniform_real_distribution<double>, the same adapter shape the reference
// harness uses (test_functions.h:40-48).  Our side replays it with the
// pure-JAX mt19937 (nlsolver_tpu/random/mt19937.py) registered through the
// reference_rngs.register hook.
struct MTGen {
  std::mt19937 generator;
  std::uniform_real_distribution<double> distribution;
  MTGen() : generator(42), distribution(0.0, 1.0) {}
  double operator()() { return distribution(generator); }
};

// ---------------- output ----------------
static void emit(const std::string &solver, const std::string &problem,
                 size_t k, const nlsolver::solver_status<double> &status,
                 const vec &x) {
  auto s = status.get_summary();  // (nfev, iter, f, gfev, hfev)
  std::printf("%s\t%s\t%zu\t%.17g\t%zu\t%zu\t%zu\t%zu", solver.c_str(),
              problem.c_str(), k, std::get<2>(s), std::get<1>(s),
              std::get<0>(s), std::get<3>(s), std::get<4>(s));
  for (double v : x) std::printf("\t%.17g", v);
  std::printf("\n");
}

static vec start2() { return vec{-0.5, -0.5}; }

// ---------------- per-family sweeps ----------------
template <typename Problem>
static void sweep_nm(const std::string &pname, size_t K = 30) {
  for (size_t k = 1; k <= K; ++k) {
    Problem f;
    vec x = start2();
    nlsolver::NelderMead<Problem, double> solver(f, -1, 1, 2, 0.5, 0.5, 1e-6,
                                                 k, 20, 0);
    auto status = solver.minimize(x);
    emit("nm", pname, k, status, x);
  }
}

template <typename Problem, nlsolver::GradientStepType Step>
static void sweep_gd(const std::string &sname, const std::string &pname,
                     double alpha, size_t K = 30) {
  for (size_t k = 1; k <= K; ++k) {
    Problem f;
    vec x = start2();
    nlsolver::GradientDescent<Problem, double, Step> solver(f, alpha, k);
    auto status = solver.minimize(x);
    emit(sname, pname, k, status, x);
  }
}

template <typename Problem>
static void sweep_cgd(const std::string &pname, size_t K = 30) {
  for (size_t k = 1; k <= K; ++k) {
    Problem f;
    vec x = start2();
    nlsolver::ConjugatedGradientDescent<Problem, double> solver(
        f, nlsolver::fin_diff<Problem, double>(), k);
    auto status = solver.minimize(x);
    emit("cgd", pname, k, status, x);
  }
}

template <typename Problem>
static void sweep_bfgs(const std::string &pname, size_t K = 30) {
  for (size_t k = 1; k <= K; ++k) {
    Problem f;
    vec x = start2();
    nlsolver::BFGS<Problem, double> solver(
        f, nlsolver::fin_diff<Problem, double>(), k);
    auto status = solver.minimize(x);
    emit("bfgs", pname, k, status, x);
  }
}

template <typename Problem>
static void sweep_lm(const std::string &pname, size_t K = 20) {
  for (size_t k = 1; k <= K; ++k) {
    Problem f;
    vec x = start2();
    nlsolver::LevenbergMarquardt<Problem, double> solver(f, 10, 10, 10, k);
    auto status = solver.minimize(x);
    emit("lm", pname, k, status, x);
  }
}

static void sweep_brent_min(size_t K = 40) {
  for (size_t k = 1; k <= K; ++k) {
    Quartic1D f;
    double x = 0.0;
    nlsolver::Brent<Quartic1D, double> solver(f, 1e-12, 1e-12, k);
    auto status = solver.minimize(x, -5.0, 5.0);
    // reference quirk (nlsolver.h:3424-3425): x_ holds f(x), status holds x.
    // Emit both raw slots; the python side knows the swap.
    emit("brent_min", "quartic1d", k, status, vec{x});
  }
}

// Stochastic family: DE with the reference's own RNG functors.  Our side
// replays the identical draw sequence through the bit-parity generators in
// nlsolver_tpu/random/reference_rngs.py (solvers/de_reference.py).
template <typename Problem, typename RNG, nlsolver::RecombinationStrategy S>
static void sweep_de(const std::string &sname, const std::string &pname,
                     size_t K = 30) {
  for (size_t k = 1; k <= K; ++k) {
    Problem f;
    vec x = start2();
    RNG gen;  // default ctor: splitmix(12374563468) seeding quirks included
    nlsolver::DE<Problem, RNG, double, S> solver(f, gen, 0.9, 0.8, 10e-4, 50,
                                                 k, 50);
    auto status = solver.minimize(x);
    emit(sname, pname, k, status, x);
  }
}

template <typename Problem, typename RNG>
static void sweep_sann(const std::string &sname, const std::string &pname,
                       size_t K = 30) {
  for (size_t k = 1; k <= K; ++k) {
    Problem f;
    vec x = start2();
    RNG gen;
    nlsolver::SANN<Problem, RNG, double> solver(f, gen, k, 10, 10.0);
    auto status = solver.minimize(x);
    emit(sname, pname, k, status, x);
  }
}

// Accelerated PSO only: the Vanilla velocity update reads
// swarm_best_position[particle_index] (nlsolver.h:2674), which for
// n_particles > n_dim reads past the end of an n_dim-sized allocation —
// its trajectories are allocator-dependent UB, not algorithm output.
template <typename Problem, typename RNG>
static void sweep_pso_acc(const std::string &sname, const std::string &pname,
                          size_t K = 30) {
  for (size_t k = 1; k <= K; ++k) {
    Problem f;
    vec x = start2();
    RNG gen;
    nlsolver::PSO<Problem, RNG, double, nlsolver::PSOType::Accelerated> solver(
        f, gen, 0.8, 1.8, 1.8, 10, k, 50, 10e-4);
    auto status = solver.minimize(x);
    emit(sname, pname, k, status, x);
  }
}

template <typename Problem, typename RNG>
static void sweep_nmpso(const std::string &sname, const std::string &pname,
                        size_t K = 30) {
  for (size_t k = 1; k <= K; ++k) {
    Problem f;
    vec x = start2();
    RNG gen;
    nlsolver::NelderMeadPSO<Problem, RNG, double> solver(
        f, gen, 1, 2, 0.5, 0.5, 0.8, 1.8, 1.8, 1e-6, k, 20);
    auto status = solver.minimize(x);
    emit(sname, pname, k, status, x);
  }
}

static void sweep_roots() {
  const double lo = 1.0, hi = 3.0;
  for (size_t k = 1; k <= 12; ++k) {
    CubicRoot f;
    double x = 0.0;
    auto s = nlsolver::rootfinder::bisection(f, x, lo, hi, 1e-6, k);
    emit("root_bisection", "cubic", k, s, vec{x});
  }
  for (size_t k = 1; k <= 12; ++k) {
    CubicRoot f;
    double x = 0.0;
    auto s = nlsolver::rootfinder::false_position(f, x, lo, hi, 1e-6, k);
    emit("root_false_position", "cubic", k, s, vec{x});
  }
  for (size_t k = 1; k <= 12; ++k) {
    CubicRoot f;
    double x = 0.0;
    auto s = nlsolver::rootfinder::brent(f, x, lo, hi, 1e-12, k);
    emit("root_brent", "cubic", k, s, vec{x});
  }
  for (size_t k = 1; k <= 8; ++k) {
    CubicRoot f;
    double x = 0.0;
    auto s = nlsolver::rootfinder::ridders(f, x, lo, hi, 1e-12, 1e-12, k);
    emit("root_ridders", "cubic", k, s, vec{x});
  }
  for (size_t k = 1; k <= 12; ++k) {
    CubicRoot f;
    double x = 0.0;
    auto s = nlsolver::rootfinder::itp(f, x, lo, hi, 0.3, 2.1, 1.0, 1e-12,
                                       1e-12, k);
    emit("root_itp", "cubic", k, s, vec{x});
  }
  for (size_t k = 1; k <= 12; ++k) {
    CubicRoot f;
    double x = 0.0;
    auto s = nlsolver::rootfinder::chandrupatla(f, x, lo, hi, 1e-10, 2e-10, k);
    emit("root_chandrupatla", "cubic", k, s, vec{x});
  }
  for (size_t k = 1; k <= 10; ++k) {
    CubicRoot f;
    double x = 0.0;
    auto s = nlsolver::rootfinder::tiruneh(f, x, std::array<double, 3>{1., 2., 3.},
                                           1e-6, 1e-12, k);
    emit("root_tiruneh", "cubic", k, s, vec{x});
  }
}

int main() {
  std::printf(
      "# solver\tproblem\tk\tf_value\titers\tnfev\tgfev\thfev\tx...\n");
  sweep_nm<Rosenbrock>("rosenbrock");
  sweep_nm<Booth>("booth");
  sweep_nm<McCormick>("mccormick");

  sweep_gd<Booth, nlsolver::GradientStepType::Fixed>("gd_fixed", "booth",
                                                     0.05);
  sweep_gd<Rosenbrock, nlsolver::GradientStepType::Fixed>("gd_fixed",
                                                          "rosenbrock", 0.001);
  sweep_gd<Booth, nlsolver::GradientStepType::Anneal>("gd_anneal", "booth",
                                                      0.05);
  sweep_gd<Rosenbrock, nlsolver::GradientStepType::Anneal>(
      "gd_anneal", "rosenbrock", 0.001);
  sweep_gd<Booth, nlsolver::GradientStepType::Bigstep>("gd_bigstep", "booth",
                                                       1.0);
  sweep_gd<Rosenbrock, nlsolver::GradientStepType::Bigstep>(
      "gd_bigstep", "rosenbrock", 1.0);
  sweep_gd<Rosenbrock, nlsolver::GradientStepType::Linesearch>(
      "gd_linesearch", "rosenbrock", 1.0);
  sweep_gd<Booth, nlsolver::GradientStepType::Linesearch>("gd_linesearch",
                                                          "booth", 1.0);
  sweep_gd<McCormick, nlsolver::GradientStepType::Linesearch>(
      "gd_linesearch", "mccormick", 1.0);
  // PAGE: p = minibatch/(minibatch'+minibatch) is size_t division == 0
  // (nlsolver.h:2944), so the correction branch is taken every iteration
  // and the internal xorshift draw never affects the trajectory
  sweep_gd<Booth, nlsolver::GradientStepType::PAGE>("gd_page", "booth", 0.05);
  sweep_gd<Rosenbrock, nlsolver::GradientStepType::PAGE>("gd_page",
                                                         "rosenbrock", 0.001);

  sweep_cgd<Rosenbrock>("rosenbrock");
  sweep_cgd<Booth>("booth");

  sweep_bfgs<Rosenbrock>("rosenbrock");
  sweep_bfgs<Booth>("booth");
  sweep_bfgs<McCormick>("mccormick");

  sweep_lm<Rosenbrock>("rosenbrock");
  sweep_lm<Booth>("booth");

  sweep_brent_min();
  sweep_roots();

  using XS = nlsolver::rng::xorshift<double>;
  using XO = nlsolver::rng::xoshiro<double>;
  using RC = nlsolver::rng::recurrent<double>;
  using HL = nlsolver::rng::halton<double>;
  sweep_de<Rosenbrock, XS, nlsolver::random>("de_rand_xorshift", "rosenbrock");
  sweep_de<Booth, XS, nlsolver::random>("de_rand_xorshift", "booth");
  sweep_de<Rosenbrock, XS, nlsolver::best>("de_best_xorshift", "rosenbrock");
  sweep_de<Rosenbrock, XO, nlsolver::random>("de_rand_xoshiro", "rosenbrock");
  // the remaining reference RNG streams (test_functions.h:328-384 runs
  // recurrent and mt configs through the same solvers)
  sweep_de<Rosenbrock, RC, nlsolver::random>("de_rand_recurrent", "rosenbrock");
  sweep_de<Booth, RC, nlsolver::random>("de_rand_recurrent", "booth");
  sweep_de<Rosenbrock, HL, nlsolver::random>("de_rand_halton", "rosenbrock");
  sweep_de<Booth, HL, nlsolver::random>("de_rand_halton", "booth");
  sweep_de<Rosenbrock, MTGen, nlsolver::random>("de_rand_mt", "rosenbrock");
  sweep_de<Booth, MTGen, nlsolver::random>("de_rand_mt", "booth");

  sweep_sann<Rosenbrock, XS>("sann_xorshift", "rosenbrock");
  sweep_sann<Booth, XS>("sann_xorshift", "booth");
  sweep_pso_acc<Rosenbrock, XS>("pso_acc_xorshift", "rosenbrock");
  sweep_pso_acc<Booth, XS>("pso_acc_xorshift", "booth");
  sweep_nmpso<Rosenbrock, XS>("nmpso_xorshift", "rosenbrock");
  sweep_nmpso<Booth, XS>("nmpso_xorshift", "booth");
  // family x stream breadth: SANN / accelerated PSO / NM-PSO on the
  // remaining streams their reference harness configs exercise
  sweep_sann<Rosenbrock, XO>("sann_xoshiro", "rosenbrock");
  sweep_sann<Rosenbrock, RC>("sann_recurrent", "rosenbrock");
  sweep_pso_acc<Rosenbrock, XO>("pso_acc_xoshiro", "rosenbrock");
  sweep_nmpso<Rosenbrock, XO>("nmpso_xoshiro", "rosenbrock");
  return 0;
}
