"""Device mesh helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROWS_AXIS = "rows"


def make_mesh(n_devices: int | None = None, axis: str = ROWS_AXIS) -> Mesh:
    """1-D mesh over the trace-row axis (the primary sharding axis, §5.7).

    Multi-host runs call ``jax.distributed.initialize`` before this; the
    mesh spans all global devices either way.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def row_sharding(mesh: Mesh, ndim: int, axis: str = ROWS_AXIS) -> NamedSharding:
    """Shard the last axis (rows/domain) of a (16, ..., N) limb array."""
    spec = [None] * (ndim - 1) + [axis]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
