"""Device mesh helpers: shard frame batches over ICI.

The reference's entire concurrency story is rayon work-stealing over
channels/files (SURVEY §2.7); the TPU-native replacement is a 1-D (or 2-D)
``jax.sharding.Mesh`` with the frame-batch axis sharded across chips.
Per-frame work is embarrassingly parallel, so no collectives cross the
interconnect during encode — only the host gather of finished plans.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_mesh(devices: Optional[Sequence] = None,
               axis_name: str = "batch") -> Mesh:
    """1-D mesh over all (or the given) devices for frame-batch sharding."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(mesh: Mesh, arr, axis_name: Optional[str] = None):
    """Place an array with its leading (batch) axis sharded over the mesh.

    ``axis_name`` defaults to the mesh's first axis, so meshes named
    differently (e.g. a 2-D ("data", "model") mesh) work out of the box —
    the batch axis shards over that first mesh dimension.
    """
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    spec = P(axis_name, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
