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
                        pid: jax.Array, n_shards: int, cap: int,
                        axis: str = AXIS):
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
    send_valid = slot < jnp.minimum(counts, cap)[:, None]

    # slice each partition's contiguous run out of the sorted arrays
    # with per-shard dynamic slices: contiguous HBM reads instead of a
    # 2n-element gather (measured: the gather ran at ~20M rows/s, two
    # orders below the sort itself; dynamic slices are plain streams).
    # A cap-sized sentinel pad keeps every start in bounds.
    def pack(a_s):
        padded = jnp.concatenate(
            [a_s, jnp.zeros(cap, dtype=a_s.dtype)])
        return jnp.stack([
            lax.dynamic_slice(padded, (starts[p],), (cap,))
            for p in range(n_shards)])

    out_arrays = [pack(a_s) for a_s in sorted_arrays]

    # the exchange: block j of the send buffer goes to shard j
    recv = [lax.all_to_all(a, axis, split_axis=0, concat_axis=0,
                           tiled=False) for a in out_arrays]
    recv_valid = lax.all_to_all(send_valid, axis, split_axis=0,
                                concat_axis=0, tiled=False)
    out = tuple(r.reshape(n_shards * cap) for r in recv)
    return out, recv_valid.reshape(n_shards * cap), overflow


def exchange_by_key(key: jax.Array, arrays: Sequence[jax.Array],
                    valid: jax.Array, n_shards: int, cap: int):
    """Hash-partition rows by `key` across shards (inside shard_map)."""
    pid = partition_ids(key, n_shards)
    return all_to_all_exchange(list(arrays), valid, pid, n_shards, cap)


def all_to_all_exchange_2level(arrays: Sequence[jax.Array],
                               valid: jax.Array, pid: jax.Array,
                               n_hosts: int, n_chips: int, cap: int,
                               host_axis: str = "h",
                               chip_axis: str = AXIS):
    """Two-level shuffle over a (hosts x chips) mesh (SURVEY section 7
    step 8): rows reach global shard pid = host*n_chips + chip via

      phase A  all_to_all over the CHIP axis (ICI, within host): every
               row moves to its target CHIP COLUMN, carrying its
               target-host id
      phase B  all_to_all over the HOST axis (DCN, across hosts): chip
               columns exchange rows by target host

    Phase A rides the fast intra-host interconnect and packs rows so
    phase B's cross-host (DCN-modelled) transfer moves each row exactly
    once — the standard hierarchical-shuffle layout the scaling
    playbook prescribes (vs. one flat all_to_all whose pairs mostly
    cross DCN).  Returns (out_arrays [n_hosts*n_chips*cap], out_valid,
    overflow)."""
    chip_t = (pid % n_chips).astype(jnp.int32)
    host_t = (pid // n_chips).astype(jnp.int32)
    # phase A: to target chip within this host, carrying host_t
    outs_a, valid_a, ovf_a = all_to_all_exchange(
        list(arrays) + [host_t], valid, chip_t, n_chips, cap,
        axis=chip_axis)
    host_a = outs_a[-1]
    outs_a = list(outs_a[:-1])
    # phase B: across hosts by carried target host
    outs_b, valid_b, ovf_b = all_to_all_exchange(
        outs_a, valid_a, host_a.astype(jnp.int32), n_hosts,
        n_chips * cap, axis=host_axis)
    return tuple(outs_b), valid_b, ovf_a + ovf_b
