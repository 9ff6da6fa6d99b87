"""Grouped and ungrouped aggregation kernels.

TPU-native replacement for the reference's GroupedAggregateHashTable /
RadixPartitionedHashTable (reference: src/execution/aggregate_hashtable.cpp,
radix_partitioned_hashtable.cpp).  Instead of a CAS-probed hash table (no
atomics in XLA dataflow), grouping is sort-based and branch-free:

  1. multi-operand `lax.sort` over encoded group keys (+ carried row id)
  2. adjacent-difference -> group boundaries -> dense segment ids (cumsum)
  3. `jax.ops.segment_*` reductions with statically capped #segments

Invalid rows sort to the back (leading invalid-flag operand) and land in a
trash segment.  Aggregate NULL semantics: NULLs are ignored; empty groups /
all-NULL inputs yield NULL (except COUNT).  Sums over DECIMAL accumulate in
exact int64 (TODO(i128) for >18-digit sums at SF100).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from .. import types as T
from ..types import DataType, TypeId
from . import sortkey


class AggPayload(NamedTuple):
    """One aggregate input: function kind + evaluated argument."""
    kind: str                      # sum|min|max|count|count_star|avg|sum_float|any_value
    data: Optional[jax.Array]      # None for count_star
    nulls: Optional[jax.Array]


def group_and_aggregate(key_ops: Sequence[jax.Array],
                        key_data: Sequence,   # list[(data, nulls)] raw key cols
                        payloads: Sequence[AggPayload],
                        sel: jax.Array,
                        num_groups_cap: int):
    """Returns (group_cols, agg_results, group_sel, ngroups).

    key_ops: pre-encoded sort operands (from sortkey.encode_key).
    group_cols: [(data, nulls)] per original key column, at group granularity.
    agg_results: [(data, nulls)] per payload.
    """
    cap = sel.shape[0]
    rowid = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    invalid = (~sel).astype(jnp.int32)
    operands = [invalid, *key_ops, rowid]
    sorted_ops = lax.sort(operands, num_keys=len(operands) - 1,
                          is_stable=True)
    inv_s = sorted_ops[0]
    keys_s = sorted_ops[1:-1]
    rid_s = sorted_ops[-1]
    valid_s = inv_s == 0

    # boundaries: first valid row of each distinct key run
    diff = jnp.zeros(cap, dtype=bool).at[0].set(True)
    for k in keys_s:
        d = jnp.concatenate([jnp.ones(1, dtype=bool), k[1:] != k[:-1]])
        diff = diff | d
    boundary = diff & valid_s
    gid = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    gid = jnp.where(valid_s, gid, num_groups_cap)   # trash segment
    ngroups = boundary.sum().astype(jnp.int32)

    nseg = num_groups_cap + 1
    seg_kw = dict(num_segments=nseg, indices_are_sorted=True)

    # representative original row per group (min rowid in group)
    first_rid = jax.ops.segment_min(rid_s, gid, **seg_kw)[:num_groups_cap]
    first_rid = jnp.where(
        lax.broadcasted_iota(jnp.int32, (num_groups_cap,), 0) < ngroups,
        first_rid, 0)

    group_cols = []
    for data, nulls in key_data:
        gdat = data[first_rid]
        gnul = nulls[first_rid] if nulls is not None else None
        group_cols.append((gdat, gnul))

    agg_results = _run_aggs(payloads, gid, rid_s, num_groups_cap, seg_kw)
    gsel = lax.broadcasted_iota(jnp.int32, (num_groups_cap,), 0) < ngroups
    return group_cols, agg_results, gsel, ngroups


def _run_aggs(payloads, gid, rid_s, ncap, seg_kw):
    """Shared segment-reduce executor; gid/rid_s in sorted order."""
    results = []
    ones = jnp.ones(gid.shape[0], dtype=jnp.int64)
    for p in payloads:
        if p.kind == "count_star":
            cnt = jax.ops.segment_sum(ones, gid, **seg_kw)[:ncap]
            results.append((cnt, None))
            continue
        data_s = p.data[rid_s]
        nn = None
        if p.nulls is not None:
            nn = p.nulls[rid_s]
        notnull = ones if nn is None else (~nn).astype(jnp.int64)
        cnt = jax.ops.segment_sum(notnull, gid, **seg_kw)[:ncap]
        if p.kind == "count":
            results.append((cnt, None))
        elif p.kind in ("sum", "sum_float", "avg"):
            acc_dt = jnp.float64 if (p.kind == "sum_float"
                                     or data_s.dtype in (jnp.float32,
                                                         jnp.float64)) \
                else jnp.int64
            v = data_s.astype(acc_dt)
            if nn is not None:
                v = jnp.where(nn, jnp.zeros_like(v), v)
            s = jax.ops.segment_sum(v, gid, **seg_kw)[:ncap]
            if p.kind == "avg":
                out = s.astype(jnp.float64) / jnp.maximum(cnt, 1)
                results.append((out, cnt == 0))
            else:
                results.append((s, cnt == 0))
        elif p.kind in ("min", "max"):
            big = _extreme(data_s.dtype, p.kind)
            v = data_s
            if nn is not None:
                v = jnp.where(nn, big, v)
            fn = jax.ops.segment_min if p.kind == "min" else jax.ops.segment_max
            r = fn(v, gid, **seg_kw)[:ncap]
            results.append((r, cnt == 0))
        elif p.kind == "any_value":
            # first non-null value: min rowid among non-null rows
            rid_big = jnp.where(
                notnull > 0, rid_s, jnp.full_like(rid_s, np.int32(2**31 - 1)))
            fr = jax.ops.segment_min(rid_big, gid, **seg_kw)[:ncap]
            frc = jnp.clip(fr, 0, p.data.shape[0] - 1)
            results.append((p.data[frc], cnt == 0))
        else:
            raise NotImplementedError(p.kind)
    return results


def _extreme(dt, kind):
    if dt in (jnp.float32, jnp.float64):
        v = np.inf if kind == "min" else -np.inf
        return jnp.asarray(v, dtype=dt)
    info = np.iinfo(np.dtype(dt))
    return jnp.asarray(info.max if kind == "min" else info.min, dtype=dt)


def ungrouped_aggregate(payloads: Sequence[AggPayload], sel: jax.Array):
    """All-rows aggregation -> per-payload (scalar, isnull).  Deterministic
    reduction order (XLA tree-reduce) for reproducible float sums."""
    results = []
    nsel = sel.astype(jnp.int64)
    for p in payloads:
        if p.kind == "count_star":
            results.append((nsel.sum(), None))
            continue
        live = sel if p.nulls is None else (sel & ~p.nulls)
        cnt = live.astype(jnp.int64).sum()
        if p.kind == "count":
            results.append((cnt, None))
        elif p.kind in ("sum", "sum_float", "avg"):
            acc_dt = jnp.float64 if (p.kind == "sum_float"
                                     or p.data.dtype in (jnp.float32,
                                                         jnp.float64)) \
                else jnp.int64
            v = jnp.where(live, p.data.astype(acc_dt),
                          jnp.zeros((), dtype=acc_dt))
            s = v.sum()
            if p.kind == "avg":
                results.append((s.astype(jnp.float64)
                                / jnp.maximum(cnt, 1), cnt == 0))
            else:
                results.append((s, cnt == 0))
        elif p.kind in ("min", "max"):
            big = _extreme(p.data.dtype, p.kind)
            v = jnp.where(live, p.data, big)
            r = v.min() if p.kind == "min" else v.max()
            results.append((r, cnt == 0))
        elif p.kind == "any_value":
            idx = jnp.argmax(live)
            results.append((p.data[idx], cnt == 0))
        else:
            raise NotImplementedError(p.kind)
    return results
