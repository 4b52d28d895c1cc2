from .mesh import particle_mesh, setup_distributed
from .sharded import make_sharded_step, shard_state, replicate_batch

__all__ = [
    "particle_mesh",
    "setup_distributed",
    "make_sharded_step",
    "shard_state",
    "replicate_batch",
]
