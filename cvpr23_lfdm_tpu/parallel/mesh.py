"""Device mesh + sharding helpers.

TPU-native replacement for the reference's distributed layer
(sync_batchnorm/ + torch DataParallel, SURVEY.md §5): a 1-D `data` mesh
over which batches are sharded and parameters replicated. Gradient
all-reduce and cross-device batch-norm statistics come out of XLA's SPMD
partitioner as ICI collectives — no hand-written communication.

The axis layout is extensible: `make_mesh((dp, tp), ("data", "model"))`
yields a 2-D mesh for tensor-parallel experiments; everything in
`train/` only requires the `data` axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: int | tuple[int, ...] | None = None,
    axis_names: tuple[str, ...] = ("data",),
    devices=None,
) -> Mesh:
    """Create a mesh. Defaults to all devices on one `data` axis."""
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
    elif isinstance(shape, int):
        shape = (shape,)
    n = int(np.prod(shape))
    dev = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """First-dim (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place a host batch onto the mesh, sharded along dim 0."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, opt state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
