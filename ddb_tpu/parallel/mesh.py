"""Device mesh helpers.

The reference is single-node thread-parallel (reference: src/parallel/
task_scheduler.cpp); its TPU-native equivalent is SPMD over a device mesh
with ICI collectives (SURVEY.md section 2.5 TPU mapping).  One mesh axis
("d") spans all chips; tables are hash-partitioned over it.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.4.35 exposes shard_map at top level
    from jax import shard_map as _shard_map_mod
    shard_map = jax.shard_map
except (ImportError, AttributeError):
    from jax.experimental.shard_map import shard_map  # type: ignore

AXIS = "d"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
