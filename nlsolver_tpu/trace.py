"""Per-iteration trajectory capture for the state-machine solvers.

The reference destroys its per-iteration state on return (solver-local
``std::vector`` buffers, e.g. nlsolver.h:2166-2299); observing a trajectory
there requires re-running the whole solve once per prefix length.  Here every
solver is a pure ``init``/``step`` machine, so one fixed-trip scan
(:func:`nlsolver_tpu.core.driver.drive_trace`) yields the entire iterate
sequence in a single compiled program — used for debugging, plotting, and the
trajectory-parity suite against the reference binary
(tests/test_trajectory_parity.py).

``trajectory(...)`` returns a dict of stacked arrays with a leading
``[num_steps]`` axis; entry ``i`` is the state after ``i+1`` solver
iterations, with finished lanes frozen (so the tail of a converged run
repeats its fixed point — exactly what re-running the reference with
``max_iter=i+1`` produces).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .core.driver import drive_trace
from .core.objective import resolve_bounds
from .solvers import (bfgs, cgd, de_reference, gd, lm, nelder_mead,
                      nmpso_reference, pso_reference, sann_reference)


def _de_ref(fn, x0, config, num_steps, bounds):
    state0 = de_reference.init(fn, x0, config)
    _, tr = drive_trace(
        lambda s: de_reference.step(fn, s, config), state0, num_steps
    )
    best = jax.vmap(de_reference.report_best)(tr)
    take = jax.vmap(lambda a, b: a[b])
    return {
        "x": take(tr.agents, best),
        "f": take(tr.scores, best),
        "iteration": tr.iteration,
        "nfev": tr.nfev,
        "done": tr.done,
    }


def _sann_ref(fn, x0, config, num_steps, bounds):
    state0 = sann_reference.init(fn, x0, config)
    _, tr = drive_trace(
        lambda s: sann_reference.step(fn, s, config), state0, num_steps
    )
    return {
        "x": tr.x,
        "f": tr.best_val,
        "iteration": tr.iteration,
        "nfev": tr.nfev,
        "done": tr.done,
    }


def _pso_ref(fn, x0, config, num_steps, bounds):
    state0 = pso_reference.init(fn, x0, config)
    _, tr = drive_trace(
        lambda s: pso_reference.step(fn, s, config), state0, num_steps
    )
    return {
        "x": tr.swarm_best,
        "f": tr.swarm_best_value,
        "iteration": tr.iteration,
        "nfev": tr.nfev,
        "done": tr.done,
    }


def _nmpso_ref(fn, x0, config, num_steps, bounds):
    state0 = nmpso_reference.init(fn, x0, config)
    _, tr = drive_trace(
        lambda s: nmpso_reference.step(fn, s, config), state0, num_steps
    )
    best = jax.vmap(nmpso_reference.report_best)(tr)
    take = jax.vmap(lambda a, b: a[b])
    return {
        "x": take(tr.positions, best),
        "f": take(tr.values, best),
        "iteration": tr.iteration,
        "nfev": tr.nfev,
        "done": tr.done,
    }


def _nm(fn, x0, config, num_steps, bounds):
    lower, upper, bounded = resolve_bounds(bounds, x0)
    state0 = nelder_mead.init(fn, x0, config, bounds)
    _, tr = drive_trace(
        lambda s: nelder_mead.step(fn, s, config, lower, upper, bounded),
        state0,
        num_steps,
    )
    best = jnp.argmin(tr.scores, axis=-1)
    take = jax.vmap(lambda sim, b: sim[b])
    return {
        "x": take(tr.simplex, best),
        "f": jnp.min(tr.scores, axis=-1),
        "iteration": tr.iteration,
        "nfev": tr.nfev,
        "done": tr.done,
    }


def _plain(module, needs_key):
    def run(fn, x0, config, num_steps, bounds):
        if needs_key:
            state0 = module.init(fn, x0, config, jax.random.key(0))
        else:
            state0 = module.init(fn, x0, config)
        _, tr = drive_trace(lambda s: module.step(fn, s, config), state0, num_steps)
        out = {
            "x": tr.x,
            "f": jax.vmap(fn)(tr.x),
            "iteration": tr.iteration,
            "nfev": tr.nfev,
            "done": tr.done,
        }
        return out

    return run


_FAMILIES = {
    "nelder_mead": (_nm, nelder_mead.NelderMeadConfig),
    "gd": (_plain(gd, True), gd.GDConfig),
    "cgd": (_plain(cgd, False), cgd.CGDConfig),
    "bfgs": (_plain(bfgs, False), bfgs.BFGSConfig),
    "lm": (_plain(lm, False), lm.LMConfig),
    "de_reference": (_de_ref, de_reference.DEReferenceConfig),
    "sann_reference": (_sann_ref, sann_reference.SANNReferenceConfig),
    "pso_acc_reference": (_pso_ref, pso_reference.PSOAccReferenceConfig),
    "nmpso_reference": (_nmpso_ref, nmpso_reference.NMPSOReferenceConfig),
}


def trajectory(
    family: str,
    fn,
    x0,
    config=None,
    *,
    num_steps: int = 50,
    bounds=None,
):
    """Capture ``num_steps`` iterates of ``family`` minimizing ``fn`` from
    ``x0``.  Supported families: bfgs, cgd, de_reference, gd, lm,
    nelder_mead, nmpso_reference, pso_acc_reference, sann_reference.
    """
    if family not in _FAMILIES:
        raise ValueError(
            f"unknown family {family!r}; supported: {sorted(_FAMILIES)}"
        )
    run, default_cfg = _FAMILIES[family]
    if config is None:
        config = default_cfg()
    x0 = jnp.asarray(x0)
    return run(fn, x0, config, num_steps, bounds)
