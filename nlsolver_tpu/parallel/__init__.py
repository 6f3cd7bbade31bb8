from .de_sharded import minimize_sharded
from .mesh import DP_AXIS, POP_AXIS, instance_sharding, make_mesh, population_sharding

__all__ = [
    "DP_AXIS",
    "POP_AXIS",
    "instance_sharding",
    "make_mesh",
    "minimize_sharded",
    "population_sharding",
]
