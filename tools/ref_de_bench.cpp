// Timing probe: the reference's flagship DE (README example workload shape)
// on 10-D Rastrigin, pop=64 — single-threaded C++ as shipped.
#include <chrono>
#include <cmath>
#include <cstdio>
#include <vector>
#include "nlsolver.h"
using vec = std::vector<double>;
struct Rastrigin10 {
  double operator()(vec &x) {
    double s = 10.0 * x.size();
    for (double v : x) s += v * v - 10.0 * std::cos(2.0 * M_PI * v);
    return s;
  }
};
int main() {
  const size_t iters = 2000;
  double best = 1e300;
  auto t0 = std::chrono::steady_clock::now();
  int reps = 5;
  for (int r = 0; r < reps; r++) {
    Rastrigin10 f;
    nlsolver::rng::xorshift<double> gen;
    // crossover 0.9, F 0.8, eps 0 (never converge), pop 64, max_iter, no-change huge
    nlsolver::DE<Rastrigin10, nlsolver::rng::xorshift<double>, double,
                 nlsolver::random> solver(f, gen, 0.9, 0.8, 0.0, 64, iters, 1<<30);
    vec x(10, 1.0);
    auto st = solver.minimize(x);
    auto s = st.get_summary();
    if (std::get<2>(s) < best) best = std::get<2>(s);
  }
  auto t1 = std::chrono::steady_clock::now();
  double sec = std::chrono::duration<double>(t1 - t0).count() / reps;
  std::printf("per-solve: %.3f ms for %zu generations x 64 agents x 10-D\n",
              sec * 1e3, iters);
  std::printf("generations/s: %.0f   agent-steps/s: %.3e   best f: %g\n",
              iters / sec, iters * 64.0 / sec, best);
  return 0;
}
