"""Top-level user API.

``minimize(fn, x0, method=..., ...)`` / ``maximize(...)`` dispatch to the
solver modules; each solver also exposes a functional ``init``/``step`` pair
for advanced composition (custom drivers, sharded populations).

A reference user writes (README.md:77-110):

    auto de = DE<...>(problem, gen); de.minimize(x);

here:

    result = nlsolver_tpu.minimize(problem, x0, method="de", key=key)

and batching 10k instances is just ``jax.vmap`` over ``x0`` / ``key``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .core import Bounds, SolverResult

_METHODS = {}


def _register():
    import importlib

    for name in (
        "nelder_mead",
        "de",
        "pso",
        "sann",
        "nmpso",
        "gd",
        "cgd",
        "bfgs",
        "lm",
        "brent",
        "cmaes",
        "lbfgs",
        "lbfgsb",
        "coordinate",
    ):
        try:
            _METHODS[name] = importlib.import_module(f".solvers.{name}", __package__)
        except ImportError:
            pass


def methods():
    if not _METHODS:
        _register()
    return sorted(_METHODS)


def minimize(
    fn,
    x0,
    method: str = "nelder_mead",
    config=None,
    bounds: Optional[Bounds] = None,
    *,
    key: Optional[jax.Array] = None,
    **kwargs,
) -> SolverResult:
    if not _METHODS:
        _register()
    mod = _METHODS[method]
    x0 = jnp.asarray(x0)
    if config is None:
        return mod.minimize(fn, x0, bounds=bounds, key=key, **kwargs)
    return mod.minimize(fn, x0, config, bounds=bounds, key=key, **kwargs)


def maximize(
    fn,
    x0,
    method: str = "nelder_mead",
    config=None,
    bounds: Optional[Bounds] = None,
    *,
    key: Optional[jax.Array] = None,
    **kwargs,
) -> SolverResult:
    if not _METHODS:
        _register()
    mod = _METHODS[method]
    x0 = jnp.asarray(x0)
    if config is None:
        return mod.maximize(fn, x0, bounds=bounds, key=key, **kwargs)
    return mod.maximize(fn, x0, config, bounds=bounds, key=key, **kwargs)
