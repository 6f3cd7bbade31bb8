"""Mesh-sharded CMA-ES fleet.

The fleet (solvers/cmaes_fleet.py) is lane-parallel with NO cross-lane
data flow — every update including the batched Jacobi eigensolver is
elementwise over the trailing lane axis — so sharding is pure data
parallelism: pin the lane axis over every mesh device and XLA partitions
the whole while_loop with zero collectives (verified: the dryrun executes
it on the virtual 8-device mesh; tests assert layout invariance).

This wrapper exists for API symmetry with de_sharded / pso_sharded: it
shards the inputs, runs the fleet, and returns per-lane results in the
caller's order.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..core import Bounds
from ..solvers import cmaes_fleet
from .fleet_sharded import _check_width, _lane_sharding


def minimize_fleet_sharded(
    fn,
    X0: jax.Array,                      # [n, B] batch-minor start points
    config: cmaes_fleet.CMAESFleetConfig,
    mesh: Mesh,
    bounds: Optional[Bounds] = None,
    *,
    key: Optional[jax.Array] = None,
):
    """B independent CMA-ES strategies with the lane axis sharded over
    EVERY device of ``mesh`` (both named axes — strategies are
    embarrassingly parallel, unlike populations).  Width check and lane
    sharding are the shared fleet helpers (parallel/fleet_sharded.py)."""
    n, B = X0.shape
    _check_width(B, mesh)
    X0 = jax.device_put(jnp.asarray(X0), _lane_sharding(mesh))
    if key is None:
        key = jax.random.key(0)

    @jax.jit
    def run(X0, key):
        return cmaes_fleet.minimize_fleet(fn, X0, config, bounds, key=key)

    return run(X0, key)
