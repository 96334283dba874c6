"""Device mesh helpers.

The reference has no parallelism (SURVEY.md §2d) — here batches of images
shard over a `data` mesh axis (DP) and a single image's chunk stream can
shard over a `seq` axis (the codec's sequence-parallel analog), with seam
state exchanged over ICI via collectives (parallel/sharded.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "seq"),
) -> Mesh:
    """Build a device mesh.  Default: all devices on `data`, 1 on `seq`."""
    devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert int(np.prod(shape)) == n, f"mesh {shape} != {n} devices"
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
