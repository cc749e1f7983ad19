"""Device-mesh construction and batch shardings.

The reference has **no parallelism machinery at all** (SURVEY.md §2:
no torch.distributed, no NCCL/MPI; the batch dimension is the sole
parallel axis). This package is the TPU build's replacement: the batch
axes of every op shard across a ``jax.sharding.Mesh``; within a slice
the compiler's collectives ride ICI, across slices DCN. Batch-parallel
ops need **zero** communication (tested in test_parallel.py); only
global reductions (nansum/nanmean scalars, trace-estimator moments)
insert a ``psum``.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "make_mesh",
    "batch_sharding",
    "put_batch",
    "BATCH_AXIS",
]

BATCH_AXIS = "dp"


def make_mesh(
    shape: Union[int, Sequence[int], None] = None,
    axis_names: Sequence[str] = (BATCH_AXIS,),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    ``shape=None`` uses all devices on one ``dp`` axis; an int uses that
    many; a tuple builds a multi-axis mesh (e.g. ``(4, 2)`` with
    ``axis_names=('dp', 'mp')``).
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
        if shape is None:
            raise ValueError("shape required for multi-axis meshes")
    elif isinstance(shape, int):
        shape = (shape,)
    else:
        shape = tuple(shape)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(
    mesh: Mesh, ndim: int, batch_axis: int = 0, mesh_axis: str = BATCH_AXIS
) -> NamedSharding:
    """NamedSharding that shards array axis ``batch_axis`` of an
    ``ndim``-dim array over ``mesh_axis`` and replicates the rest."""
    spec = [None] * ndim
    spec[batch_axis] = mesh_axis
    return NamedSharding(mesh, PartitionSpec(*spec))


def put_batch(x, mesh: Mesh, batch_axis: int = 0, mesh_axis: str = BATCH_AXIS):
    """Device-put ``x`` sharded along its batch axis."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    return jax.device_put(x, batch_sharding(mesh, x.ndim, batch_axis, mesh_axis))
