"""Distributed hash-partition exchange + distributed operators.

TPU-native replacement for the reference's partitioned-sink parallelism
(reference: src/common/radix_partitioning.cpp, RadixPartitionedHashTable /
JoinHashTable partitioned builds): thread-local radix partitions become
per-chip shards, and the shared-memory partition handoff becomes an ICI
`all_to_all` inside shard_map.

Protocol (fixed shapes, branch-free):
  1. per shard: pid = high-bits(hash64(key)) % n_shards
  2. stable sort local rows by pid; per-pid slot index = running offset
  3. scatter rows into a [n_shards, cap] send buffer (overflow rows drop
     into a sticky overflow counter the caller must check / retry larger)
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
    # stable sort by pid so rows of one partition are contiguous
    rowid = lax.broadcasted_iota(jnp.int32, (n,), 0)
    sp, srow = lax.sort([p, rowid], num_keys=1, is_stable=True)
    # slot within partition = position - start(partition)
    pos = lax.broadcasted_iota(jnp.int32, (n,), 0)
    is_start = jnp.concatenate([jnp.ones(1, dtype=bool),
                                sp[1:] != sp[:-1]])
    start_pos = jnp.where(is_start, pos, 0)
    start_of_run = lax.associative_scan(jnp.maximum, start_pos)
    slot = pos - start_of_run
    ok = (sp < big) & (slot < cap)
    overflow = ((sp < big) & (slot >= cap)).astype(jnp.int32).sum()
    dest = jnp.where(ok, sp * cap + slot, n_shards * cap)  # drop slot

    out_arrays = []
    for a in arrays:
        buf = jnp.zeros(n_shards * cap + 1, dtype=a.dtype)
        buf = buf.at[dest].set(a[srow], mode="drop")
        out_arrays.append(buf[:-1].reshape(n_shards, cap))
    vbuf = jnp.zeros(n_shards * cap + 1, dtype=bool)
    vbuf = vbuf.at[dest].set(ok, mode="drop")
    send_valid = vbuf[:-1].reshape(n_shards, cap)

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
