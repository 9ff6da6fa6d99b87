"""64-bit hashing for partitioning/shuffles.

Analog of the reference's vector hash kernels
(reference: src/common/types/hash.cpp, vector_operations/vector_hash.cpp).
SplitMix64 finalizer: good avalanche, pure int ops, fuses on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_C0 = np.uint64(0x9E3779B97F4A7C15)


def hash64(x) -> jnp.ndarray:
    """SplitMix64 over int values (any int dtype)."""
    z = x.astype(jnp.uint64) + _C0
    z = (z ^ (z >> np.uint64(30))) * _C1
    z = (z ^ (z >> np.uint64(27))) * _C2
    z = z ^ (z >> np.uint64(31))
    return z


def hash_combine(h, x) -> jnp.ndarray:
    """Combine an existing hash with another column (boost-style mix)."""
    return hash64(h ^ (x.astype(jnp.uint64) + _C0 + (h << np.uint64(6))
                       + (h >> np.uint64(2))))


def partition_of(h, num_partitions: int) -> jnp.ndarray:
    """Map hash -> partition id [0, num_partitions) using high bits."""
    return (h >> np.uint64(33)).astype(jnp.int32) % num_partitions
