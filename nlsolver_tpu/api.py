"""Top-level user API.

``minimize(fn, x0, method=..., ...)`` / ``maximize(...)`` dispatch to the
solver modules; each solver also exposes a functional ``init``/``step`` pair
for advanced composition (custom drivers, sharded populations).

A reference user writes (README.md:77-110):

    auto de = DE<...>(problem, gen); de.minimize(x);

here:

    result = nlsolver_tpu.minimize(problem, x0, method="de", key=key)

The TPU-first flagships are reachable through the same entry point via the
``layout`` switch:

    * ``layout="single"`` (default) — one problem instance;
    * ``layout="batched"`` — ``x0`` is ``[B, n]``; DE uses the lane-axis
      ``de_batched`` engine, every other method is ``vmap``-ped;
    * ``layout="fleet"`` — batch-minor ``[n, B]`` lane fleets
      (``method="bfgs"`` -> ``solvers.bfgs_fleet``);
    * ``layout="sharded"`` — population sharded over a device ``mesh``
      (``method="de"`` / ``"pso"`` -> ``parallel.*_sharded``);
    * ``layout="islands"`` — island-model DE with ring migration over
      ``mesh`` (``method="de"`` -> ``parallel.de_island``).

Root finding (the reference's ``nlsolver::rootfinder`` free functions,
nlsolver.h:3923-4319) is ``root(fn, lower, upper, method=...)``; nonlinear
least squares is ``fit`` / ``fit_batched`` / ``curve_fit``
(re-exported from ``solvers.nlls``).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .core import Bounds, SolverResult, signed
from .solvers.nlls import NLLSConfig, curve_fit, fit, fit_batched  # noqa: F401

_METHODS = {}
_LAYOUTS = ("single", "batched", "fleet", "sharded", "islands")


def _register():
    import importlib

    for name in (
        "nelder_mead",
        "de",
        "de_batched",
        "pso",
        "sann",
        "nmpso",
        "gd",
        "cgd",
        "bfgs",
        "bfgs_fleet",
        "lm",
        "nlls",
        "brent",
        "cmaes",
        "cmaes_fleet",
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


def _resolve(method: str):
    if not _METHODS:
        _register()
    try:
        return _METHODS[method]
    except KeyError:
        raise ValueError(
            f"unknown method {method!r}; available methods: "
            f"{', '.join(sorted(_METHODS))}"
        ) from None


def _dispatch(
    fn,
    x0,
    method: str,
    config,
    bounds: Optional[Bounds],
    key: Optional[jax.Array],
    layout: str,
    mesh,
    keys: Optional[jax.Array],
    _minimize: bool,
    kwargs,
) -> SolverResult:
    mod = _resolve(method)
    x0 = jnp.asarray(x0)
    verb = "minimize" if _minimize else "maximize"

    if layout not in _LAYOUTS:
        raise ValueError(f"unknown layout {layout!r}; one of {_LAYOUTS}")

    if layout == "single":
        f = getattr(mod, verb, None)
        if f is None:
            hint = {
                "de_batched": "use method='de' with layout='batched'",
                "bfgs_fleet": "use method='bfgs' with layout='fleet'",
                "nlls": "use nlsolver_tpu.fit / fit_batched / curve_fit",
            }.get(method, "see nlsolver_tpu.methods()")
            raise ValueError(
                f"method {method!r} has no single-instance {verb}; {hint}"
            )
        if config is None:
            return f(fn, x0, bounds=bounds, key=key, **kwargs)
        return f(fn, x0, config, bounds=bounds, key=key, **kwargs)

    if x0.ndim != 2:
        raise ValueError(f"layout={layout!r} expects a 2-D x0, got {x0.shape}")

    # one key policy for every multi-instance layout: an explicit keys=
    # wins; otherwise key= (or the default key(0)) is split per instance.
    # Never let lanes fall through to a solver-internal default key — that
    # silently runs every "independent" lane on an identical stream.
    n_lanes = x0.shape[1] if layout == "fleet" else x0.shape[0]
    if keys is None and layout != "fleet":
        keys = jax.random.split(
            key if key is not None else jax.random.key(0), n_lanes
        )

    if layout == "batched":
        if method in ("de", "de_batched"):
            if bounds is not None:
                raise ValueError(
                    "the lane-axis DE engine is unbounded; use method='de' "
                    "with layout='single' under jax.vmap for bounded batches"
                )
            de_batched = _METHODS["de_batched"]
            cfg = config if config is not None else _METHODS["de"].DEConfig()
            return de_batched.minimize_batched(
                fn, x0, cfg, keys=keys, _minimize=_minimize, **kwargs
            )
        if bounds is not None:
            kwargs = dict(kwargs, bounds=bounds)

        def one(x0_i, key_i):
            f = getattr(mod, verb)
            if config is None:
                return f(fn, x0_i, key=key_i, **kwargs)
            return f(fn, x0_i, config, key=key_i, **kwargs)

        return jax.vmap(one)(x0, keys)

    # every engine below minimizes; one shared sign wrapper handles
    # maximize (negated objective in, f_value flipped back out)
    fn = signed(fn, _minimize)
    unflip = (lambda r: r) if _minimize else (
        lambda r: r._replace(f_value=-r.f_value)
    )

    if layout == "fleet":
        if method in ("cmaes", "cmaes_fleet"):
            from .solvers import cmaes_fleet

            cfg = config if config is not None else cmaes_fleet.CMAESFleetConfig()
            return unflip(
                cmaes_fleet.minimize_fleet(fn, x0, cfg, bounds, key=key, **kwargs)
            )
        if method not in ("bfgs", "bfgs_fleet"):
            raise ValueError(
                f"layout='fleet' supports method='bfgs' (batch-minor lane "
                f"fleet) and method='cmaes' (lane-parallel CMA-ES "
                f"strategies), got {method!r}; other methods batch via "
                f"layout='batched'"
            )
        fleet = _METHODS["bfgs_fleet"]
        fn_cols = kwargs.pop("fn_cols", None)
        if fn_cols is None:
            # adapt a single-point objective to the [n, B] -> [B] column form
            fn_cols = lambda X: jax.vmap(fn)(X.T)  # noqa: E731
        cfg = config if config is not None else fleet.BFGSFleetConfig()
        return unflip(fleet.minimize_fleet(fn_cols, x0, cfg, **kwargs))

    # sharded / islands: population-parallel engines over a device mesh
    if mesh is None:
        raise ValueError(f"layout={layout!r} requires a mesh= argument")

    if layout == "islands":
        if method != "de":
            raise ValueError(f"layout='islands' supports method='de', got {method!r}")
        from .parallel import de_island

        cfg = config if config is not None else _METHODS["de"].DEConfig()
        res = de_island.minimize_islands(fn, x0, cfg, mesh, keys=keys, **kwargs)
    else:  # sharded
        if method == "de":
            from .parallel import de_sharded as eng

            cfg = config if config is not None else _METHODS["de"].DEConfig()
        elif method == "pso":
            from .parallel import pso_sharded as eng

            cfg = config if config is not None else _METHODS["pso"].PSOConfig()
        else:
            raise ValueError(
                f"layout='sharded' supports method='de' or 'pso', got {method!r}"
            )
        res = eng.minimize_sharded(fn, x0, cfg, mesh, keys=keys, **kwargs)
    return unflip(res)


def minimize(
    fn,
    x0,
    method: str = "nelder_mead",
    config=None,
    bounds: Optional[Bounds] = None,
    *,
    key: Optional[jax.Array] = None,
    layout: str = "single",
    mesh=None,
    keys: Optional[jax.Array] = None,
    **kwargs,
) -> SolverResult:
    return _dispatch(
        fn, x0, method, config, bounds, key, layout, mesh, keys, True, kwargs
    )


def maximize(
    fn,
    x0,
    method: str = "nelder_mead",
    config=None,
    bounds: Optional[Bounds] = None,
    *,
    key: Optional[jax.Array] = None,
    layout: str = "single",
    mesh=None,
    keys: Optional[jax.Array] = None,
    **kwargs,
) -> SolverResult:
    return _dispatch(
        fn, x0, method, config, bounds, key, layout, mesh, keys, False, kwargs
    )


_ROOT_METHODS = (
    "bisection",
    "false_position",
    "brent",
    "ridders",
    "tiruneh",
    "itp",
    "chandrupatla",
)


def root(fn, lower=None, upper=None, method: str = "brent", **kwargs):
    """Find a root of scalar ``fn`` (nlsolver::rootfinder, nlsolver.h:3923-4319).

    Bracketing methods take ``lower``/``upper``; ``tiruneh`` takes its
    3-point history via ``x_k=`` instead.  Returns a ``RootResult``.
    All finders vmap over batched brackets.
    """
    from .solvers import rootfind

    if method not in _ROOT_METHODS:
        raise ValueError(
            f"unknown root method {method!r}; available: {', '.join(_ROOT_METHODS)}"
        )
    finder = getattr(rootfind, method)
    if method == "tiruneh":
        if lower is not None or upper is not None:
            raise ValueError("tiruneh takes x_k=(a, b, c), not lower/upper")
        return finder(fn, **kwargs)
    return finder(fn, lower, upper, **kwargs)


def root_methods():
    return list(_ROOT_METHODS)
