"""Distributed hash-partition exchange + distributed operators.

TPU-native replacement for the reference's partitioned-sink parallelism
(reference: src/common/radix_partitioning.cpp, RadixPartitionedHashTable /
JoinHashTable partitioned builds): thread-local radix partitions become
per-chip shards, and the shared-memory partition handoff becomes an ICI
`all_to_all` inside shard_map.

Protocol (fixed shapes, branch-free, scatter-free):
  1. per shard: pid = high-bits(hash64(key)) % n_shards
  2. stable sort local rows by pid carrying every payload array
  3. slice the per-partition contiguous runs into a [n_shards, cap] send
     buffer (rows beyond cap raise an overflow counter the caller checks
     and retries with a larger cap)
  4. lax.all_to_all over the mesh axis -> [n_shards, cap] receive buffer
  5. flatten + validity mask -> local partition of the repartitioned data

Skew: callers size `cap` from a host-side max-partition estimate; heavy
hitters can be salted upstream (h2oai skew configs) — see dist_groupby's
two-phase local pre-aggregation which absorbs most skew before exchange.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from ..ops import hashing
from .mesh import AXIS


class ShardBatch(NamedTuple):
    """Per-shard view of a repartitioned relation (inside shard_map)."""
    arrays: tuple          # tuple of [cap]-shaped per-row arrays
    valid: jax.Array       # [cap] bool


def partition_ids(key: jax.Array, n_shards: int) -> jax.Array:
    return hashing.partition_of(hashing.hash64(key), n_shards)


def all_to_all_exchange(arrays: Sequence[jax.Array], valid: jax.Array,
                        pid: jax.Array, n_shards: int, cap: int):
    """Inside shard_map: route rows to their owning shard.

    arrays: per-row payload arrays [n]; valid: [n] live mask;
    pid: [n] target shard ids.  Returns (out_arrays [n_shards*cap],
    out_valid, overflow_count)."""
    n = valid.shape[0]
    big = jnp.int32(n_shards)
    p = jnp.where(valid, pid, big)
    # stable sort by pid CARRYING the payload arrays (PERF_NOTES rule 2:
    # sort operands move linearly, no permutation gather); the send
    # buffer is then per-partition contiguous SLICES of the sorted
    # arrays — no scatter (rule 1), one near-contiguous gather
    sorted_ops = lax.sort([p, *arrays], num_keys=1, is_stable=True)
    sp, sorted_arrays = sorted_ops[0], sorted_ops[1:]
    counts = jnp.stack([(sp == q).astype(jnp.int32).sum()
                        for q in range(n_shards)])          # [n_shards]
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts)[:-1]])
    overflow = jnp.maximum(counts - cap, 0).sum()
    slot = lax.broadcasted_iota(jnp.int32, (n_shards, cap), 1)
    idx = jnp.clip(starts[:, None] + slot, 0, n - 1)        # [ns, cap]
    send_valid = slot < jnp.minimum(counts, cap)[:, None]

    out_arrays = [a_s[idx.reshape(-1)].reshape(n_shards, cap)
                  for a_s in sorted_arrays]

    # the exchange: block j of the send buffer goes to shard j
    recv = [lax.all_to_all(a, AXIS, split_axis=0, concat_axis=0,
                           tiled=False) for a in out_arrays]
    recv_valid = lax.all_to_all(send_valid, AXIS, split_axis=0,
                                concat_axis=0, tiled=False)
    out = tuple(r.reshape(n_shards * cap) for r in recv)
    return out, recv_valid.reshape(n_shards * cap), overflow


def exchange_by_key(key: jax.Array, arrays: Sequence[jax.Array],
                    valid: jax.Array, n_shards: int, cap: int):
    """Hash-partition rows by `key` across shards (inside shard_map)."""
    pid = partition_ids(key, n_shards)
    return all_to_all_exchange(list(arrays), valid, pid, n_shards, cap)
