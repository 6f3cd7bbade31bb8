"""Brent 1-D minimizer (golden section + successive parabolic interpolation).

Re-creation of the reference's ``Brent`` class (nlsolver.h:3287-3427), itself
an adaptation of R's ``Brent_fmin``.  Same defaults: bracket [-5, 5],
tol=1e-12, eps=1e-12, max_iter=200.

The reference swaps its outputs by mistake — it stores the *function value*
into the caller's ``x`` and returns the minimizer inside ``solver_status``'s
f_value slot (nlsolver.h:3424-3425).  Here the result is reported correctly:
``x`` is the minimizer, ``f_value`` the objective value.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..core import SolverResult, make_result, signed


@dataclass(frozen=True)
class BrentConfig:
    tol: float = 1e-12
    eps: float = 1e-12
    max_iter: int = 200
    lower: float = -5.0
    upper: float = 5.0


GOLDEN_C = (3.0 - math.sqrt(5.0)) * 0.5  # squared inverse golden ratio


class _S(NamedTuple):
    a: jax.Array
    b: jax.Array
    d: jax.Array
    e: jax.Array
    v: jax.Array
    w: jax.Array
    x: jax.Array
    fv: jax.Array
    fw: jax.Array
    fx: jax.Array
    it: jax.Array
    nfev: jax.Array
    done: jax.Array
    converged: jax.Array


def minimize_scalar(
    fn,
    config: BrentConfig = BrentConfig(),
    *,
    _minimize: bool = True,
) -> SolverResult:
    """Minimize a scalar function of one scalar variable on [lower, upper]."""
    sfn = signed(fn, _minimize)
    dtype = jnp.result_type(config.lower, config.upper, float)
    tol, eps = config.tol, config.eps
    tol3 = tol / 3.0

    a = jnp.asarray(config.lower, dtype)
    b = jnp.asarray(config.upper, dtype)
    v = a + GOLDEN_C * (b - a)
    fx0 = sfn(v)
    zero = jnp.zeros((), dtype)
    init = _S(a, b, zero, zero, v, v, v, fx0, fx0, fx0,
              jnp.int32(0), jnp.int32(1), jnp.asarray(False), jnp.asarray(False))

    def cond(s: _S):
        return ~s.done

    def body(s: _S) -> _S:
        xm = (s.a + s.b) * 0.5
        tol1 = eps * jnp.abs(s.x) + tol3
        t2 = tol1 * 2.0
        stop = jnp.abs(s.x - xm) <= t2 - (s.b - s.a) * 0.5
        exhausted = s.it >= config.max_iter

        # parabola fit (nlsolver.h:3354-3366)
        fit = jnp.abs(s.e) > tol1
        r = jnp.where(fit, (s.x - s.w) * (s.fx - s.fv), 0.0)
        q = jnp.where(fit, (s.x - s.v) * (s.fx - s.fw), 0.0)
        p = jnp.where(fit, (s.x - s.v) * q - (s.x - s.w) * r, 0.0)
        q = (q - r) * 2.0
        p = jnp.where(q > 0.0, -p, p)
        q = jnp.where(q > 0.0, q, -q)
        r_new = s.e
        e_after_fit = jnp.where(fit, s.d, s.e)

        golden = (
            (jnp.abs(p) >= jnp.abs(q * 0.5 * r_new))
            | (p <= q * (s.a - s.x))
            | (p >= q * (s.b - s.x))
        )
        e_gold = jnp.where(s.x < xm, s.b - s.x, s.a - s.x)
        d_gold = GOLDEN_C * e_gold

        q_safe = jnp.where(q == 0.0, 1.0, q)
        d_par = p / q_safe
        u_par = s.x + d_par
        too_close_ends = ((u_par - s.a) < t2) | ((s.b - u_par) < t2)
        d_par = jnp.where(
            too_close_ends, jnp.where(s.x >= xm, -tol1, tol1), d_par
        )

        d = jnp.where(golden, d_gold, d_par)
        e = jnp.where(golden, e_gold, e_after_fit)

        u = jnp.where(
            jnp.abs(d) >= tol1,
            s.x + d,
            jnp.where(d > 0.0, s.x + tol1, s.x - tol1),
        )
        fu = sfn(u)
        nfev = s.nfev + 1

        better = fu <= s.fx
        # update a, b, v, w, x (nlsolver.h:3396-3422)
        a2 = jnp.where(better, jnp.where(u < s.x, s.a, s.x), jnp.where(u < s.x, u, s.a))
        b2 = jnp.where(better, jnp.where(u < s.x, s.x, s.b), jnp.where(u < s.x, s.b, u))
        v2 = jnp.where(better, s.w, jnp.where((fu <= s.fw) | (s.w == s.x), s.w, jnp.where((fu <= s.fv) | (s.v == s.x) | (s.v == s.w), u, s.v)))
        fv2 = jnp.where(better, s.fw, jnp.where((fu <= s.fw) | (s.w == s.x), s.fw, jnp.where((fu <= s.fv) | (s.v == s.x) | (s.v == s.w), fu, s.fv)))
        w2 = jnp.where(better, s.x, jnp.where((fu <= s.fw) | (s.w == s.x), u, s.w))
        fw2 = jnp.where(better, s.fx, jnp.where((fu <= s.fw) | (s.w == s.x), fu, s.fw))
        x2 = jnp.where(better, u, s.x)
        fx2 = jnp.where(better, fu, s.fx)

        keep = lambda old, new: jnp.where(stop | exhausted, old, new)
        return _S(
            keep(s.a, a2), keep(s.b, b2), keep(s.d, d), keep(s.e, e),
            keep(s.v, v2), keep(s.w, w2), keep(s.x, x2),
            keep(s.fv, fv2), keep(s.fw, fw2), keep(s.fx, fx2),
            jnp.where(stop | exhausted, s.it, s.it + 1),
            jnp.where(stop | exhausted, s.nfev, nfev),
            stop | exhausted,
            stop,
        )

    final = lax.while_loop(cond, body, init)
    f_val = final.fx
    return make_result(
        x=final.x,
        f_value=-f_val if not _minimize else f_val,
        iterations=final.it,
        function_calls=final.nfev,
        converged=final.converged,
    )


def minimize(fn, x0=None, config: BrentConfig = BrentConfig(), bounds=None, *, key=None):
    """Solver-module interface; x0 is ignored (bracket comes from config),
    matching the reference's (x, lower, upper) call shape."""
    if bounds is not None:
        config = BrentConfig(
            tol=config.tol, eps=config.eps, max_iter=config.max_iter,
            lower=float(bounds.lower), upper=float(bounds.upper),
        )
    return minimize_scalar(fn, config)


def maximize(fn, x0=None, config: BrentConfig = BrentConfig(), bounds=None, *, key=None):
    if bounds is not None:
        config = BrentConfig(
            tol=config.tol, eps=config.eps, max_iter=config.max_iter,
            lower=float(bounds.lower), upper=float(bounds.upper),
        )
    return minimize_scalar(fn, config, _minimize=False)
