"""Mesh runtime: batch sharding over ICI/DCN device meshes."""
from .mesh import make_mesh, batch_sharding, put_batch, BATCH_AXIS
from .shard import donating, shard_batch, shard_reduce, trapprox_sharded

__all__ = [
    "make_mesh",
    "batch_sharding",
    "put_batch",
    "BATCH_AXIS",
    "donating",
    "shard_batch",
    "shard_reduce",
    "trapprox_sharded",
]
