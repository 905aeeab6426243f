"""Mesh construction and batch-sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def sharded_batch_spec(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding for arrays whose leading axis is the env batch."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = DATA_AXIS):
    """Place a batched pytree with its leading axis sharded over the mesh."""
    sh = sharded_batch_spec(mesh, axis)
    return jax.device_put(tree, sh)
