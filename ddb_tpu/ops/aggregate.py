"""Grouped and ungrouped aggregation kernels — scatter-free.

TPU-native replacement for the reference's GroupedAggregateHashTable /
RadixPartitionedHashTable (reference: src/execution/aggregate_hashtable.cpp,
radix_partitioned_hashtable.cpp).  XLA scatter serializes on TPU, so the
design uses only sorts, segmented scans and linear passes:

  1. one multi-operand `lax.sort` over encoded group keys, CARRYING all
     payload columns (no post-sort random gathers)
  2. adjacent-difference -> group boundaries -> per-row segment scans
     (associative_scan with boundary reset) accumulate sums/counts/min/max;
     each group's total materializes at its LAST row
  3. a second sort compacts last-rows to the front -> dense group tables

Benchmarked on v5e (6M rows): sort ~11-15 ms, scans ~4 ms, vs 467 ms for a
single int64 segment_sum (scatter) — the scatter-free path wins >10x.

Aggregate NULL semantics: NULLs ignored; empty/all-NULL groups yield NULL
(except COUNT).  DECIMAL sums accumulate exact int64 (TODO(i128) for
>18-digit totals at SF100).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np


class AggPayload(NamedTuple):
    """One aggregate input: function kind + evaluated argument."""
    kind: str                      # sum|min|max|count|count_star|avg|sum_float|any_value
    data: Optional[jax.Array]      # None for count_star
    nulls: Optional[jax.Array]


# ---------------------------------------------------------------------------
# segmented scans (reset at group boundary) — all associative
# ---------------------------------------------------------------------------

def _seg_sum_scan(boundary, v):
    """Within-group inclusive cumsum; boundary marks group starts."""
    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va + vb)
    f, out = lax.associative_scan(op, (boundary, v))
    return out


def _seg_minmax_scan(boundary, v, is_min: bool):
    def op(a, b):
        fa, va = a
        fb, vb = b
        keep = jnp.where(is_min, jnp.minimum(va, vb), jnp.maximum(va, vb))
        return fa | fb, jnp.where(fb, vb, keep)
    f, out = lax.associative_scan(op, (boundary, v))
    return out


def _seg_first_scan(boundary, has, v):
    """First non-null value within group (has = row contributes)."""
    def op(a, b):
        fa, ha, va = a
        fb, hb, vb = b
        # restart at boundary of b; else keep a's first if it has one
        h = jnp.where(fb, hb, ha | hb)
        val = jnp.where(fb, vb, jnp.where(ha, va, vb))
        return fa | fb, h, val
    f, h, out = lax.associative_scan(op, (boundary, has, v))
    return out


def _extreme(dt, kind):
    if dt in (jnp.float32, jnp.float64):
        v = np.inf if kind == "min" else -np.inf
        return jnp.asarray(v, dtype=dt)
    info = np.iinfo(np.dtype(dt))
    return jnp.asarray(info.max if kind == "min" else info.min, dtype=dt)


def _acc_dtype(kind, dt):
    if kind == "sum_float" or dt in (jnp.float32, jnp.float64):
        return jnp.float64
    return jnp.int64


# ---------------------------------------------------------------------------
# main entry
# ---------------------------------------------------------------------------

def group_and_aggregate(key_ops: Sequence[jax.Array],
                        key_data: Sequence,   # list[(data, nulls)]
                        payloads: Sequence[AggPayload],
                        sel: jax.Array,
                        num_groups_cap: int):
    """Returns (group_cols, agg_results, group_sel, ngroups).

    key_ops: encoded sort operands (ops/sortkey.py) — grouping order.
    group_cols: [(data, nulls)] per key column at group granularity.
    agg_results: [(data, nulls)] per payload.  All shapes [num_groups_cap].
    """
    cap = sel.shape[0]
    rowid = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    invalid = (~sel).astype(jnp.int32)

    # ---- sort, carrying key data + payload columns ----------------------
    carried = []           # list of arrays to carry through the sort
    c_idx = {}

    def carry(name, arr):
        c_idx[name] = len(carried)
        carried.append(arr)

    for i, (d, nmask) in enumerate(key_data):
        carry(("kd", i), d)
        if nmask is not None:
            carry(("kn", i), nmask.astype(jnp.int8))
    for i, p in enumerate(payloads):
        if p.data is not None:
            carry(("pd", i), p.data)
        if p.nulls is not None:
            carry(("pn", i), p.nulls.astype(jnp.int8))

    operands = [invalid, *key_ops, rowid, *carried]
    nkeys = 1 + len(key_ops)
    sorted_ops = lax.sort(operands, num_keys=nkeys, is_stable=True)
    inv_s = sorted_ops[0]
    keys_s = sorted_ops[1:nkeys]
    rid_s = sorted_ops[nkeys]
    carried_s = sorted_ops[nkeys + 1:]

    def cs(name):
        return carried_s[c_idx[name]]

    valid_s = inv_s == 0

    # ---- boundaries and group ids ---------------------------------------
    diff = jnp.zeros(cap, dtype=bool).at[0].set(True)
    for k in keys_s:
        diff = diff | jnp.concatenate(
            [jnp.ones(1, dtype=bool), k[1:] != k[:-1]])
    boundary = diff & valid_s
    ngroups = boundary.sum().astype(jnp.int32)
    total_valid = valid_s.astype(jnp.int32).sum()

    # last row of each group: next row is a boundary / invalid / end
    nxt_boundary = jnp.concatenate([boundary[1:],
                                    jnp.ones(1, dtype=bool)])
    nxt_invalid = jnp.concatenate([~valid_s[1:], jnp.ones(1, dtype=bool)])
    is_last = valid_s & (nxt_boundary | nxt_invalid)

    # ---- per-row segmented accumulations --------------------------------
    results_rows = []      # (per-row arrays whose value at is_last = result)
    for i, p in enumerate(payloads):
        if p.kind == "count_star":
            cnt = _seg_sum_scan(boundary, valid_s.astype(jnp.int64))
            results_rows.append(("count", cnt, None))
            continue
        data_s = cs(("pd", i))
        nn_s = cs(("pn", i)) if p.nulls is not None else None
        notnull = valid_s if nn_s is None else (valid_s & (nn_s == 0))
        cnt = _seg_sum_scan(boundary, notnull.astype(jnp.int64))
        if p.kind == "count":
            results_rows.append(("count", cnt, None))
        elif p.kind in ("sum", "sum_float", "avg"):
            acc = _acc_dtype(p.kind, data_s.dtype)
            v = jnp.where(notnull, data_s.astype(acc),
                          jnp.zeros((), dtype=acc))
            s = _seg_sum_scan(boundary, v)
            if p.kind == "avg":
                results_rows.append(("avg", s, cnt))
            else:
                results_rows.append(("sum", s, cnt))
        elif p.kind in ("min", "max"):
            big = _extreme(data_s.dtype, p.kind)
            v = jnp.where(notnull, data_s, big)
            m = _seg_minmax_scan(boundary, v, p.kind == "min")
            results_rows.append(("minmax", m, cnt))
        elif p.kind == "any_value":
            v = _seg_first_scan(boundary, notnull, data_s)
            results_rows.append(("minmax", v, cnt))
        else:
            raise NotImplementedError(p.kind)

    # ---- compact last-rows to dense group tables (second sort) ----------
    compact_carry = []
    for i, (d, nmask) in enumerate(key_data):
        compact_carry.append(cs(("kd", i)))
        if nmask is not None:
            compact_carry.append(cs(("kn", i)))
    for kind, arr, cnt in results_rows:
        compact_carry.append(arr)
        if cnt is not None:
            compact_carry.append(cnt)

    pos = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    not_last = (~is_last).astype(jnp.int32)
    compacted = lax.sort([not_last, pos, *compact_carry], num_keys=2,
                         is_stable=False)[2:]

    ncap = num_groups_cap
    gsel = lax.broadcasted_iota(jnp.int32, (ncap,), 0) < ngroups

    def take(idx_in_carry):
        a = compacted[idx_in_carry]
        if a.shape[0] >= ncap:
            return a[:ncap]
        return jnp.concatenate([a, jnp.zeros(ncap - a.shape[0],
                                             dtype=a.dtype)])

    out_i = 0
    group_cols = []
    for i, (d, nmask) in enumerate(key_data):
        gd = take(out_i)
        out_i += 1
        gn = None
        if nmask is not None:
            gn = take(out_i) != 0
            out_i += 1
        group_cols.append((gd, gn))

    agg_results = []
    for kind, arr, cnt in results_rows:
        gv = take(out_i)
        out_i += 1
        if cnt is not None:
            gc = take(out_i)
            out_i += 1
        else:
            gc = None
        if kind == "count":
            agg_results.append((jnp.where(gsel, gv, 0), None))
        elif kind == "sum":
            agg_results.append((gv, (gc == 0) | ~gsel))
        elif kind == "avg":
            out = gv.astype(jnp.float64) / jnp.maximum(gc, 1)
            agg_results.append((out, (gc == 0) | ~gsel))
        else:  # minmax / any_value
            agg_results.append((gv, (gc == 0) | ~gsel))

    return group_cols, agg_results, gsel, ngroups


# ---------------------------------------------------------------------------
# DISTINCT aggregates (reference: distinct_aggregate_data.cpp nested-HT
# re-aggregation) — here: sort by (group keys, value), aggregate only the
# first occurrence of each (group, value) pair.
# ---------------------------------------------------------------------------

def group_distinct_aggregate(key_ops, value_ops, payload: AggPayload,
                             sel, num_groups_cap: int):
    """One DISTINCT aggregate per call; group order matches
    group_and_aggregate over the same key_ops (same ascending key sort).
    Returns (result, isnull) arrays of shape [num_groups_cap]."""
    cap = sel.shape[0]
    invalid = (~sel).astype(jnp.int32)
    operands = [invalid, *key_ops, *value_ops]
    carried = [payload.data]
    if payload.nulls is not None:
        carried.append(payload.nulls.astype(jnp.int8))
    sorted_ops = lax.sort(operands + carried,
                          num_keys=len(operands), is_stable=False)
    inv_s = sorted_ops[0]
    keys_s = sorted_ops[1:1 + len(key_ops)]
    vals_s = sorted_ops[1 + len(key_ops):len(operands)]
    data_s = sorted_ops[len(operands)]
    nn_s = sorted_ops[len(operands) + 1] if payload.nulls is not None \
        else None
    valid_s = inv_s == 0

    kdiff = jnp.zeros(cap, dtype=bool).at[0].set(True)
    for k in keys_s:
        kdiff = kdiff | jnp.concatenate(
            [jnp.ones(1, dtype=bool), k[1:] != k[:-1]])
    vdiff = kdiff
    for v in vals_s:
        vdiff = vdiff | jnp.concatenate(
            [jnp.ones(1, dtype=bool), v[1:] != v[:-1]])
    g_boundary = kdiff & valid_s
    notnull = valid_s if nn_s is None else (valid_s & (nn_s == 0))
    first_occ = vdiff & notnull

    cnt = _seg_sum_scan(g_boundary, first_occ.astype(jnp.int64))
    if payload.kind in ("count",):
        per_row = cnt
        cnt2 = cnt
    elif payload.kind in ("sum", "sum_float", "avg"):
        acc = _acc_dtype(payload.kind, data_s.dtype)
        v = jnp.where(first_occ, data_s.astype(acc),
                      jnp.zeros((), dtype=acc))
        per_row = _seg_sum_scan(g_boundary, v)
        cnt2 = cnt
    else:
        raise NotImplementedError(f"distinct {payload.kind}")

    nxt_boundary = jnp.concatenate([g_boundary[1:],
                                    jnp.ones(1, dtype=bool)])
    nxt_invalid = jnp.concatenate([~valid_s[1:], jnp.ones(1, dtype=bool)])
    is_last = valid_s & (nxt_boundary | nxt_invalid)
    pos = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    not_last = (~is_last).astype(jnp.int32)
    _, _, gv, gc = lax.sort([not_last, pos, per_row, cnt2], num_keys=2,
                            is_stable=False)
    ncap = num_groups_cap
    gv = gv[:ncap] if gv.shape[0] >= ncap else jnp.concatenate(
        [gv, jnp.zeros(ncap - gv.shape[0], dtype=gv.dtype)])
    gc = gc[:ncap] if gc.shape[0] >= ncap else jnp.concatenate(
        [gc, jnp.zeros(ncap - gc.shape[0], dtype=gc.dtype)])
    ngroups = g_boundary.sum().astype(jnp.int32)
    gsel = lax.broadcasted_iota(jnp.int32, (ncap,), 0) < ngroups
    if payload.kind == "count":
        return jnp.where(gsel, gv, 0), None
    if payload.kind == "avg":
        return (gv.astype(jnp.float64)
                / jnp.maximum(gc, 1), (gc == 0) | ~gsel)
    return gv, (gc == 0) | ~gsel


def ungrouped_distinct(value_ops, payload: AggPayload, sel):
    """DISTINCT aggregate without GROUP BY -> (scalar, isnull)."""
    cap = sel.shape[0]
    live = sel if payload.nulls is None else (sel & ~payload.nulls)
    invalid = (~live).astype(jnp.int32)
    sorted_ops = lax.sort([invalid, *value_ops, payload.data],
                          num_keys=1 + len(value_ops), is_stable=False)
    inv_s = sorted_ops[0]
    vals_s = sorted_ops[1:-1]
    data_s = sorted_ops[-1]
    valid_s = inv_s == 0
    vdiff = jnp.zeros(cap, dtype=bool).at[0].set(True)
    for v in vals_s:
        vdiff = vdiff | jnp.concatenate(
            [jnp.ones(1, dtype=bool), v[1:] != v[:-1]])
    first_occ = vdiff & valid_s
    cnt = first_occ.astype(jnp.int64).sum()
    if payload.kind == "count":
        return cnt, None
    if payload.kind in ("sum", "sum_float", "avg"):
        acc = _acc_dtype(payload.kind, data_s.dtype)
        s = jnp.where(first_occ, data_s.astype(acc),
                      jnp.zeros((), acc)).sum()
        if payload.kind == "avg":
            return s.astype(jnp.float64) / jnp.maximum(cnt, 1), cnt == 0
        return s, cnt == 0
    raise NotImplementedError(f"distinct {payload.kind}")


# ---------------------------------------------------------------------------
# small-domain dense aggregation (PerfectHashAggregate analog,
# reference: src/execution/perfect_aggregate_hashtable.cpp) — masked loop,
# one linear pass per (group, payload): optimal for Q1-style tiny domains.
# ---------------------------------------------------------------------------

MAX_MASKED_DOMAIN = 16


def dense_group_aggregate(gid: jax.Array, domain: int,
                          payloads: Sequence[AggPayload], sel: jax.Array):
    """gid in [0, domain) per row (invalid rows may hold any value).
    Returns (agg_results, counts) with arrays of shape [domain]."""
    results = []
    group_masks = [sel & (gid == g) for g in range(domain)]
    counts = jnp.stack([m.astype(jnp.int64).sum() for m in group_masks])
    for p in payloads:
        if p.kind == "count_star":
            results.append((counts, None))
            continue
        live_masks = group_masks
        if p.nulls is not None:
            live_masks = [m & ~p.nulls for m in group_masks]
        nn = jnp.stack([m.astype(jnp.int64).sum() for m in live_masks])
        if p.kind == "count":
            results.append((nn, None))
        elif p.kind in ("sum", "sum_float", "avg"):
            acc = _acc_dtype(p.kind, p.data.dtype)
            d = p.data.astype(acc)
            s = jnp.stack([jnp.where(m, d, jnp.zeros((), acc)).sum()
                           for m in live_masks])
            if p.kind == "avg":
                results.append((s.astype(jnp.float64)
                                / jnp.maximum(nn, 1), nn == 0))
            else:
                results.append((s, nn == 0))
        elif p.kind in ("min", "max"):
            big = _extreme(p.data.dtype, p.kind)
            red = (jnp.min if p.kind == "min" else jnp.max)
            s = jnp.stack([red(jnp.where(m, p.data, big))
                           for m in live_masks])
            results.append((s, nn == 0))
        elif p.kind == "any_value":
            idxs = jnp.stack([jnp.argmax(m) for m in live_masks])
            results.append((p.data[idxs], nn == 0))
        else:
            raise NotImplementedError(p.kind)
    return results, counts


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
            acc = _acc_dtype(p.kind, p.data.dtype)
            v = jnp.where(live, p.data.astype(acc),
                          jnp.zeros((), dtype=acc))
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
