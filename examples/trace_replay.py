"""Trajectory tracing and reference replay — observability tour.

Two capabilities the reference cannot offer (its solver state is destroyed
on return, nlsolver.h:2166-2299):

1. ``nlsolver_tpu.trace.trajectory`` — one compiled scan returns EVERY
   iterate of a run (x, f, counters per iteration) for any traced family.
2. The ``*_reference`` replay solvers — run the reference's exact
   algorithm draw-for-draw on its bit-parity RNGs; with ``max_iter=k`` the
   result is bit-identical to the reference binary's (verified in
   tests/test_trajectory_parity.py).

Run: python examples/trace_replay.py   (CPU is fine)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from nlsolver_tpu import trace  # noqa: E402
from nlsolver_tpu.solvers import bfgs, de_reference  # noqa: E402

rosen = lambda x: 100.0 * (x[0] ** 2 - x[1]) ** 2 + (x[0] - 1.0) ** 2
x0 = jnp.asarray([-0.5, -0.5], jnp.float64)

# ---- 1. per-iteration trajectory of a BFGS run ----
tr = trace.trajectory(
    "bfgs", rosen, x0, bfgs.BFGSConfig(max_iter=40), num_steps=25
)
print("BFGS iterates (iteration: f(x), x):")
for i in range(0, 25, 4):
    print(
        f"  {int(tr['iteration'][i]):3d}: f={float(tr['f'][i]):.3e} "
        f"x=({float(tr['x'][i][0]):+.6f}, {float(tr['x'][i][1]):+.6f}) "
        f"nfev={int(tr['nfev'][i])}"
    )

# ---- 2. replay the reference DE, draw for draw ----
cfg = de_reference.DEReferenceConfig(max_iter=30, strategy="random",
                                     rng="xorshift")
res = jax.jit(lambda x: de_reference.minimize(rosen, x, cfg))(x0)
print(
    "\nreference-DE replay (xorshift, 30 generations): "
    f"f={float(res.f_value):.6g} x=({float(res.x[0]):.9g}, "
    f"{float(res.x[1]):.9g}) nfev={int(res.function_calls)}"
)
print("  -> identical, bit for bit, to the reference binary's "
      "DE<...>::minimize with max_iter=30")

# the traced version shows the whole convergence history in one program
tr = trace.trajectory("de_reference", rosen, x0, cfg, num_steps=30)
print("  best-so-far f by generation:",
      [f"{float(v):.3g}" for v in tr["f"][::5]])
