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

from typing import Callable, Optional, TypeVar

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .utils import tree_where

S = TypeVar("S")

# state fields probed (in order) for the progress payload's "best" value
_PROGRESS_VALUE_FIELDS = ("best_value", "f_value", "scores")


def _progress_payload(state):
    """(iteration, best, n_active) scalars from any solver state: the max
    iteration across lanes, the min of the first value-like field, and the
    count of unfinished lanes."""
    it = jnp.max(state.iteration) if hasattr(state, "iteration") else jnp.int32(0)
    best = jnp.float32(jnp.nan)
    for f in _PROGRESS_VALUE_FIELDS:
        if hasattr(state, f):
            best = jnp.min(getattr(state, f)).astype(jnp.float32)
            break
    active = jnp.sum(~state.done).astype(jnp.int32)
    return it.astype(jnp.int32), best, active


def _wrap_progress(progress: Callable, every: int):
    """Host-side shim: filters to every-k iterations (a second net behind
    the device-side cond — under vmap, cond lowers to both-branches-execute
    select, so filtering must not rely on the device predicate alone) and
    hands the user plain Python scalars.

    Duplicate suppression is per-EXECUTION, not per-trace: the callback
    closure is baked into the jit-compiled program, so any memory it keeps
    outlives one call.  With ``ordered=True`` delivery (an OPT-IN on
    :func:`attach_progress` — the default is unordered on every path,
    since vmap rejects ordered callbacks) iterations arrive monotonically
    within a run, so a lower iteration reliably means a NEW execution and
    the tracker resets.  Under unordered delivery (the default) a
    stale out-of-order report one window back is indistinguishable from a
    restart; it is treated as a restart, whose worst case is a duplicate
    report — never a lost one.  Concurrent executions of the same compiled
    function from multiple host threads interleave reports; give each its
    own ``progress`` callback if that matters."""
    last = [-1]

    def host_fn(it, best, active):
        it = int(np.max(it))
        if it < last[0]:
            last[0] = -1            # new execution of the same compiled fn
        if it == last[0]:
            return                  # duplicate report of the same iteration
        if it % every and bool(np.min(active)):
            return
        last[0] = it
        progress(iteration=it, best=float(np.min(best)),
                 active=int(np.sum(active)))

    return host_fn


def attach_progress(body: Callable[[S], S], progress: Callable,
                    progress_every: int = 50,
                    ordered: Optional[bool] = None) -> Callable[[S], S]:
    """Wrap a loop body so it reports (iteration, best, active) to the host
    callback ``progress`` every ``progress_every`` iterations via an
    ``io_callback`` — the per-iteration observability hook for long fleet
    solves (the reference prints only on destruction, nlsolver.h:131-169;
    this streams while the chip runs).

    ``ordered``: ``True`` forces in-sequence delivery, which makes the
    host-side duplicate suppression exact (see :func:`_wrap_progress`) but
    is rejected by JAX under ``vmap``; ``False`` works everywhere at the
    cost of an occasional duplicate report on out-of-order delivery.  The
    default (``None``) means unordered — the only mode valid on every
    execution path.

    Measured overhead (2048x64 DE fleet, report every 50 generations,
    CPU — the axon tunnel's PJRT lacks host callbacks, so the hook is
    CPU/direct-TPU only on this box): ~8% vs the silent solve
    (examples/progress_monitor.py).
    """
    from jax.experimental import io_callback

    every = max(int(progress_every), 1)
    host_fn = _wrap_progress(progress, every)
    use_ordered = bool(ordered)

    def wrapped(state: S) -> S:
        new_state = body(state)
        it, best, active = _progress_payload(new_state)

        def emit(args):
            io_callback(host_fn, None, *args, ordered=use_ordered)

        lax.cond((it % every == 0) | (active == 0), emit,
                 lambda args: None, (it, best, active))
        return new_state

    return wrapped


def drive(
    step_fn: Callable[[S], S],
    init_state: S,
    progress: Optional[Callable] = None,
    progress_every: int = 50,
) -> S:
    """Run ``step_fn`` until the state's ``done`` flag is set.

    ``init_state`` must have a boolean ``done`` field.  ``step_fn`` is
    responsible for setting it; the driver additionally freezes already-done
    states so the body is idempotent on finished lanes (what makes
    vmap-over-while sound).

    ``progress`` (optional) is a host callback invoked as
    ``progress(iteration=..., best=..., active=...)`` every
    ``progress_every`` iterations (plus once at termination) — see
    :func:`attach_progress`.
    """

    def cond(state: S):
        return ~state.done  # vmap reduces this with "any" automatically

    def body(state: S) -> S:
        new_state = step_fn(state)
        return tree_where(state.done, state, new_state)

    if progress is not None:
        body = attach_progress(body, progress, progress_every)

    return lax.while_loop(cond, body, init_state)


def drive_fleet_scan(step_fn: Callable[[S], S], state: S, trips: int) -> S:
    """Fixed-trip scan driver for the batch-minor fleet engines, whose
    ``step()`` freezes finished lanes INTERNALLY (mask folded into the
    update selects) — no ``tree_where`` wrapper, which would re-stream
    every state array and assumes leading-batch layouts anyway."""
    from jax import lax

    final, _ = lax.scan(lambda s, _: (step_fn(s), None), state, None, length=trips)
    return final


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
