"""Mesh-sharded lane fleets: BFGS, NLLS, PSO, SANN.

Like the CMA-ES fleet (parallel/cmaes_sharded.py), the batch-minor BFGS
fleet (solvers/bfgs_fleet.py) and NLLS fleet (solvers/nlls_fleet.py) are
lane-parallel with NO cross-lane data flow — every update (the rank-2
pass, the line search recurrence, the per-lane LM solves) is elementwise
over the trailing lane axis.  Sharding is therefore pure data
parallelism: pin the lane axis over every mesh device and XLA partitions
the whole while_loop with zero collectives.

These wrappers exist for API symmetry with de_sharded / pso_sharded /
cmaes_sharded: shard the inputs, run the fleet, return per-lane results
in the caller's order.  Reachable via
``minimize(method="bfgs", layout="sharded", mesh=...)`` and the
package-level ``fit_fleet_sharded(...)``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solvers import bfgs_fleet, nlls_fleet
from .mesh import DP_AXIS, POP_AXIS


def _lane_sharding(mesh: Mesh):
    """[.., B] arrays with the TRAILING lane axis over every device."""
    return NamedSharding(mesh, P(None, (DP_AXIS, POP_AXIS)))


def _check_width(B: int, mesh: Mesh):
    n_dev = mesh.devices.size
    if B % n_dev:
        raise ValueError(f"fleet width {B} must divide over {n_dev} devices")


def minimize_fleet_sharded(
    fn_cols,
    X0: jax.Array,                      # [n, B] batch-minor start points
    config: Optional[bfgs_fleet.BFGSFleetConfig] = None,
    mesh: Optional[Mesh] = None,
):
    """B independent BFGS minimizations with the lane axis sharded over
    EVERY device of ``mesh``.  ``fn_cols: [n, B_local] -> [B_local]`` must
    be column-wise (lane-separable), which every objective lifted via
    ``bfgs_fleet.colwise`` is."""
    if mesh is None:
        raise ValueError("minimize_fleet_sharded requires a mesh")
    _check_width(X0.shape[1], mesh)
    cfg = config if config is not None else bfgs_fleet.BFGSFleetConfig()
    X0 = jax.device_put(jnp.asarray(X0), _lane_sharding(mesh))

    @jax.jit
    def run(X0):
        return bfgs_fleet.minimize_fleet(fn_cols, X0, cfg)

    return run(X0)


def minimize_pso_fleet_sharded(
    fn,
    x0: jax.Array,                      # [B, n] per-instance width vectors
    config=None,
    mesh: Optional[Mesh] = None,
    *,
    keys: Optional[jax.Array] = None,
    bounds=None,
):
    """B independent PSO swarms (the lane-axis engine
    solvers/pso_batched.py, state [n, P, B]) with the INSTANCE lane axis
    sharded over every device.  Like the BFGS/NLLS fleets there is no
    cross-lane data flow — the swarm-best reduction is over the particle
    (sublane) axis — so sharding is pure data parallelism.  Per-instance
    keys make results invariant to the mesh layout (tested)."""
    from ..solvers import pso_batched
    from ..solvers.pso import PSOConfig

    if mesh is None:
        raise ValueError("minimize_pso_fleet_sharded requires a mesh")
    _check_width(x0.shape[0], mesh)
    cfg = config if config is not None else PSOConfig()
    lead = NamedSharding(mesh, P((DP_AXIS, POP_AXIS)))
    x0 = jax.device_put(
        jnp.asarray(x0), NamedSharding(mesh, P((DP_AXIS, POP_AXIS), None))
    )
    if keys is None:
        keys = jax.random.split(jax.random.key(0), x0.shape[0])
    keys = jax.device_put(keys, lead)

    @jax.jit
    def run(x0, keys):
        return pso_batched.minimize_batched(fn, x0, cfg, bounds, keys=keys)

    return run(x0, keys)


def minimize_sann_fleet_sharded(
    fn,
    x0: jax.Array,                      # [B, n] start points
    config=None,
    mesh: Optional[Mesh] = None,
    *,
    keys: Optional[jax.Array] = None,
):
    """B independent SANN chains (solvers/sann_batched.py, state [n, B])
    with the instance lane axis sharded over every device — pure data
    parallelism, per-instance streams, layout-invariant results."""
    from ..solvers import sann_batched
    from ..solvers.sann import SANNConfig

    if mesh is None:
        raise ValueError("minimize_sann_fleet_sharded requires a mesh")
    _check_width(x0.shape[0], mesh)
    cfg = config if config is not None else SANNConfig()
    lead = NamedSharding(mesh, P((DP_AXIS, POP_AXIS)))
    x0 = jax.device_put(
        jnp.asarray(x0), NamedSharding(mesh, P((DP_AXIS, POP_AXIS), None))
    )
    if keys is None:
        keys = jax.random.split(jax.random.key(0), x0.shape[0])
    keys = jax.device_put(keys, lead)

    @jax.jit
    def run(x0, keys):
        return sann_batched.minimize_batched(fn, x0, cfg, keys=keys)

    return run(x0, keys)


def fit_fleet_sharded(
    residual_fn,
    X0: jax.Array,                      # [n, B] batch-minor start points
    config: Optional[nlls_fleet.NLLSFleetConfig] = None,
    mesh: Optional[Mesh] = None,
    data=None,                          # per-instance pytree, leading dim B
):
    """B independent least-squares fits, lane axis sharded over every
    device; per-instance ``data`` (leading dim B) is sharded to match."""
    if mesh is None:
        raise ValueError("fit_fleet_sharded requires a mesh")
    _check_width(X0.shape[1], mesh)
    cfg = config if config is not None else nlls_fleet.NLLSFleetConfig()
    X0 = jax.device_put(jnp.asarray(X0), _lane_sharding(mesh))
    if data is not None:
        lead = NamedSharding(mesh, P((DP_AXIS, POP_AXIS)))
        data = jax.tree_util.tree_map(
            lambda a: jax.device_put(jnp.asarray(a), lead), data
        )

    @jax.jit
    def run(X0, data):
        return nlls_fleet.fit_fleet(residual_fn, X0, cfg, data=data)

    return run(X0, data)
