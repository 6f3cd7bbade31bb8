from .rank2 import (
    rank2_update_batched,
    rank2_update_batched_jnp,
    rank2_update_batched_pallas,
)
from .smallchol import solve_spd_batched, solve_spd_batched_pallas

__all__ = [
    "rank2_update_batched",
    "rank2_update_batched_jnp",
    "rank2_update_batched_pallas",
    "solve_spd_batched",
    "solve_spd_batched_pallas",
]
