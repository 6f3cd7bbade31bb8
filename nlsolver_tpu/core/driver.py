"""Generic iterative-solver driver.

Every solver in this framework is a pure state machine — ``init`` builds an
explicit state pytree, ``step`` maps state -> state, and a ``done`` flag in
the state encodes the solver's composite stopping rule (the reference's
``while(true) { ...; if (stop) return; }`` loops, e.g. nlsolver.h:2200-2237).

One driver serves every execution mode:
  * ``jit``   — single problem instance, compiled once;
  * ``vmap``  — thousands of instances per chip; JAX batches the
                ``while_loop`` (cond becomes "any lane still running"), and
                finished lanes are frozen via ``tree_where`` so divergent
                per-instance iteration counts are handled without dynamic
                shapes;
  * ``shard_map`` — the same program over a device mesh with populations
                sharded across ICI.
"""
from __future__ import annotations

from typing import Callable, TypeVar

import jax
from jax import lax

from .utils import tree_where

S = TypeVar("S")


def drive(step_fn: Callable[[S], S], init_state: S) -> S:
    """Run ``step_fn`` until the state's ``done`` flag is set.

    ``init_state`` must have a boolean ``done`` field.  ``step_fn`` is
    responsible for setting it; the driver additionally freezes already-done
    states so the body is idempotent on finished lanes (what makes
    vmap-over-while sound).
    """

    def cond(state: S):
        return ~state.done  # vmap reduces this with "any" automatically

    def body(state: S) -> S:
        new_state = step_fn(state)
        return tree_where(state.done, state, new_state)

    return lax.while_loop(cond, body, init_state)


def drive_scan(step_fn: Callable[[S], S], init_state: S, num_steps: int) -> S:
    """Fixed-trip-count variant (``lax.scan`` over ``num_steps``).

    Useful for benchmarking (deterministic work per run) and for pipelined
    multi-device execution where a static schedule beats a dynamic loop.
    Finished lanes are frozen exactly as in :func:`drive`.
    """

    def body(state: S, _):
        new_state = tree_where(state.done, state, step_fn(state))
        return new_state, None

    final, _ = lax.scan(body, init_state, None, length=num_steps)
    return final


def drive_trace(step_fn: Callable[[S], S], init_state: S, num_steps: int):
    """Fixed-trip driver that also returns the full per-iteration state trace.

    Returns ``(final_state, trace)`` where every leaf of ``trace`` has a
    leading ``[num_steps]`` axis: ``trace[i]`` is the state after ``i+1``
    steps (finished lanes frozen, exactly like :func:`drive_scan`).  This is
    the observability hook behind :mod:`nlsolver_tpu.trace` and the
    trajectory-parity suite — the reference offers no equivalent (its
    per-iteration state lives in solver-local ``std::vector``\\ s and is
    destroyed on return, nlsolver.h:2166-2299).
    """

    def body(state: S, _):
        new_state = tree_where(state.done, state, step_fn(state))
        return new_state, new_state

    return lax.scan(body, init_state, None, length=num_steps)
