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
(except COUNT).  DECIMAL/integer sums accumulate exact int64 when
plan/bounds.py proves no overflow, else exact two-limb i128-style
accumulation (_WIDE_KINDS) — reference analog: hugeint sum states.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np


class AggPayload(NamedTuple):
    """One aggregate input: function kind + evaluated argument.

    kinds: sum|sum_float|avg|min|max|count|count_star|any_value|
           var_samp|var_pop|stddev_samp|stddev_pop|
           covar_samp|covar_pop|corr (two-argument: data2)"""
    kind: str
    data: Optional[jax.Array]      # None for count_star
    nulls: Optional[jax.Array]
    data2: Optional[jax.Array] = None   # second argument (corr/covar)


_VAR_KINDS = ("var_samp", "var_pop", "stddev_samp", "stddev_pop")
_COVAR_KINDS = ("covar_samp", "covar_pop", "corr")

# wide (i128-style) sums: accumulate two int64 limbs (lo = v & 0xffffffff,
# hi = v >> 32); exact for any count <= 2^31 of int64 inputs.  Reference
# analog: hugeint sum states (extension/core_functions/aggregate/
# distributive/sum.cpp).  Selected by plan/bounds.py overflow analysis.
_WIDE_KINDS = ("sum_wide", "avg_wide")
_LO_MASK = 0xFFFFFFFF


def _split_limbs(v64):
    lo = v64 & jnp.int64(_LO_MASK)
    hi = v64 >> jnp.int64(32)
    return lo, hi


def _finalize_wide(slo, shi):
    """Summed limbs -> (composed int64, true high limb).

    composed = value mod 2^64 (exact whenever the value fits int64, so all
    narrow consumers — joins, sorts, comparisons — keep working); the true
    value is always hi * 2^32 + (composed & 0xffffffff) since int64 wrap
    preserves the low bits."""
    return slo + (shi << jnp.int64(32)), shi + (slo >> jnp.int64(32))


def _compose_f64(slo, shi):
    return shi.astype(jnp.float64) * float(2 ** 32) + slo.astype(jnp.float64)


def _finalize_var(kind, s1, s2, cnt):
    """Population/sample variance & stddev from Σx, Σx², n (float64)."""
    n = jnp.maximum(cnt, 1).astype(jnp.float64)
    mean = s1 / n
    m2 = s2 / n - mean * mean
    m2 = jnp.maximum(m2, 0.0)
    if kind.endswith("_pop"):
        var = m2
        bad = cnt == 0
    else:
        var = m2 * n / jnp.maximum(n - 1, 1)
        bad = cnt <= 1
    if kind.startswith("stddev"):
        return jnp.sqrt(var), bad
    return var, bad


def _finalize_covar(kind, sx, sy, sxy, sxx, syy, cnt):
    n = jnp.maximum(cnt, 1).astype(jnp.float64)
    mx, my = sx / n, sy / n
    cov_p = sxy / n - mx * my
    if kind == "covar_pop":
        return cov_p, cnt == 0
    if kind == "covar_samp":
        return cov_p * n / jnp.maximum(n - 1, 1), cnt <= 1
    vx = jnp.maximum(sxx / n - mx * mx, 0.0)
    vy = jnp.maximum(syy / n - my * my, 0.0)
    denom = jnp.sqrt(vx * vy)
    # corr over a constant/singleton group is NaN like the reference
    # (CorrOperation::Finalize: 0-variance => 0/0; our one-pass covar
    # keeps cancellation noise, so force the NaN on zero variance);
    # NULL only for the empty group
    return jnp.where(denom == 0, jnp.nan, cov_p / denom), cnt == 0


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


def _seg_prod_scan(boundary, v):
    """Within-group inclusive cumproduct (float64; reference: product
    aggregate, core_functions/aggregate/distributive/product.cpp)."""
    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va * vb)
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


def _seg_last_scan(boundary, has, v):
    """Last non-null value within group (reference: last())."""
    def op(a, b):
        fa, ha, va = a
        fb, hb, vb = b
        h = jnp.where(fb, hb, ha | hb)
        val = jnp.where(hb, vb, jnp.where(fb, vb, va))
        return fa | fb, h, val
    f, h, out = lax.associative_scan(op, (boundary, has, v))
    return out


_BIT_OPS = {"bit_and": jnp.bitwise_and, "bit_or": jnp.bitwise_or,
            "bit_xor": jnp.bitwise_xor}
_BIT_NEUTRAL = {"bit_and": -1, "bit_or": 0, "bit_xor": 0}
BIT_KINDS = ("bit_and", "bit_or", "bit_xor")


def _seg_bit_scan(boundary, v, kind):
    """Within-group inclusive bitwise and/or/xor (reference:
    core_functions/aggregate/distributive/bitagg.cpp)."""
    bop = _BIT_OPS[kind]

    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, bop(va, vb))
    f, out = lax.associative_scan(op, (boundary, v))
    return out


def _extreme(dt, kind):
    if dt in (jnp.float32, jnp.float64):
        v = np.inf if kind == "min" else -np.inf
        return jnp.asarray(v, dtype=dt)
    if np.dtype(dt) == np.bool_:
        return jnp.asarray(kind == "min", dtype=jnp.bool_)
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
        if p.data2 is not None:
            carry(("p2", i), p.data2)
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
    # entries: (kind, [per-row arrays whose value at is_last = result],
    #           cnt_per_row or None)
    results_rows = []
    for i, p in enumerate(payloads):
        if p.kind == "count_star":
            cnt = _seg_sum_scan(boundary, valid_s.astype(jnp.int64))
            results_rows.append(("count", [cnt], None))
            continue
        data_s = cs(("pd", i))
        nn_s = cs(("pn", i)) if p.nulls is not None else None
        notnull = valid_s if nn_s is None else (valid_s & (nn_s == 0))
        cnt = _seg_sum_scan(boundary, notnull.astype(jnp.int64))
        if p.kind == "count":
            results_rows.append(("count", [cnt], None))
        elif p.kind in ("sum", "sum_float", "avg"):
            acc = _acc_dtype(p.kind, data_s.dtype)
            v = jnp.where(notnull, data_s.astype(acc),
                          jnp.zeros((), dtype=acc))
            s = _seg_sum_scan(boundary, v)
            results_rows.append((("avg" if p.kind == "avg" else "sum"),
                                 [s], cnt))
        elif p.kind in _WIDE_KINDS:
            v64 = jnp.where(notnull, data_s.astype(jnp.int64),
                            jnp.zeros((), jnp.int64))
            lo, hi = _split_limbs(v64)
            slo = _seg_sum_scan(boundary, lo)
            shi = _seg_sum_scan(boundary, hi)
            results_rows.append((p.kind, [slo, shi], cnt))
        elif p.kind == "product":
            v = jnp.where(notnull, data_s.astype(jnp.float64), 1.0)
            s = _seg_prod_scan(boundary, v)
            results_rows.append(("minmax", [s], cnt))
        elif p.kind in ("min", "max"):
            big = _extreme(data_s.dtype, p.kind)
            v = jnp.where(notnull, data_s, big)
            m = _seg_minmax_scan(boundary, v, p.kind == "min")
            results_rows.append(("minmax", [m], cnt))
        elif p.kind == "any_value":
            v = _seg_first_scan(boundary, notnull, data_s)
            results_rows.append(("minmax", [v], cnt))
        elif p.kind == "last":
            v = _seg_last_scan(boundary, notnull, data_s)
            results_rows.append(("minmax", [v], cnt))
        elif p.kind in BIT_KINDS:
            neutral = jnp.asarray(_BIT_NEUTRAL[p.kind],
                                  dtype=data_s.dtype)
            v = jnp.where(notnull, data_s, neutral)
            s = _seg_bit_scan(boundary, v, p.kind)
            results_rows.append(("minmax", [s], cnt))
        elif p.kind in _VAR_KINDS:
            x = jnp.where(notnull, data_s.astype(jnp.float64), 0.0)
            s1 = _seg_sum_scan(boundary, x)
            s2 = _seg_sum_scan(boundary, x * x)
            results_rows.append((p.kind, [s1, s2], cnt))
        elif p.kind in _COVAR_KINDS:
            d2 = cs(("p2", i))
            x = jnp.where(notnull, data_s.astype(jnp.float64), 0.0)
            y = jnp.where(notnull, d2.astype(jnp.float64), 0.0)
            arrs = [_seg_sum_scan(boundary, x),
                    _seg_sum_scan(boundary, y),
                    _seg_sum_scan(boundary, x * y),
                    _seg_sum_scan(boundary, x * x),
                    _seg_sum_scan(boundary, y * y)]
            results_rows.append((p.kind, arrs, cnt))
        else:
            raise NotImplementedError(p.kind)

    # ---- compact last-rows to dense group tables (second sort) ----------
    compact_carry = []
    for i, (d, nmask) in enumerate(key_data):
        compact_carry.append(cs(("kd", i)))
        if nmask is not None:
            compact_carry.append(cs(("kn", i)))
    for kind, arrs, cnt in results_rows:
        compact_carry.extend(arrs)
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
    for kind, arrs, cnt in results_rows:
        gvs = []
        for _ in arrs:
            gvs.append(take(out_i))
            out_i += 1
        if cnt is not None:
            gc = take(out_i)
            out_i += 1
        else:
            gc = None
        if kind == "count":
            agg_results.append((jnp.where(gsel, gvs[0], 0), None))
        elif kind == "sum":
            agg_results.append((gvs[0], (gc == 0) | ~gsel))
        elif kind == "sum_wide":
            lo, hi = _finalize_wide(gvs[0], gvs[1])
            agg_results.append(((lo, hi), (gc == 0) | ~gsel))
        elif kind == "avg_wide":
            out = _compose_f64(gvs[0], gvs[1]) / jnp.maximum(gc, 1)
            agg_results.append((out, (gc == 0) | ~gsel))
        elif kind == "avg":
            out = gvs[0].astype(jnp.float64) / jnp.maximum(gc, 1)
            agg_results.append((out, (gc == 0) | ~gsel))
        elif kind in _VAR_KINDS:
            out, bad = _finalize_var(kind, gvs[0], gvs[1], gc)
            agg_results.append((out, bad | ~gsel))
        elif kind in _COVAR_KINDS:
            out, bad = _finalize_covar(kind, *gvs, gc)
            agg_results.append((out, bad | ~gsel))
        else:  # minmax / any_value
            agg_results.append((gvs[0], (gc == 0) | ~gsel))

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
        per_rows = [cnt]
    elif payload.kind in ("sum", "sum_float", "avg"):
        acc = _acc_dtype(payload.kind, data_s.dtype)
        v = jnp.where(first_occ, data_s.astype(acc),
                      jnp.zeros((), dtype=acc))
        per_rows = [_seg_sum_scan(g_boundary, v)]
    elif payload.kind in _WIDE_KINDS:
        v64 = jnp.where(first_occ, data_s.astype(jnp.int64),
                        jnp.zeros((), jnp.int64))
        lo, hi = _split_limbs(v64)
        per_rows = [_seg_sum_scan(g_boundary, lo),
                    _seg_sum_scan(g_boundary, hi)]
    elif payload.kind == "product":
        v = jnp.where(first_occ, data_s.astype(jnp.float64), 1.0)
        per_rows = [_seg_prod_scan(g_boundary, v)]
    else:
        raise NotImplementedError(f"distinct {payload.kind}")

    nxt_boundary = jnp.concatenate([g_boundary[1:],
                                    jnp.ones(1, dtype=bool)])
    nxt_invalid = jnp.concatenate([~valid_s[1:], jnp.ones(1, dtype=bool)])
    is_last = valid_s & (nxt_boundary | nxt_invalid)
    pos = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    not_last = (~is_last).astype(jnp.int32)
    outs = lax.sort([not_last, pos, *per_rows, cnt], num_keys=2,
                    is_stable=False)[2:]
    ncap = num_groups_cap

    def fit(a):
        if a.shape[0] >= ncap:
            return a[:ncap]
        return jnp.concatenate([a, jnp.zeros(ncap - a.shape[0],
                                             dtype=a.dtype)])

    gvs = [fit(a) for a in outs[:-1]]
    gc = fit(outs[-1])
    ngroups = g_boundary.sum().astype(jnp.int32)
    gsel = lax.broadcasted_iota(jnp.int32, (ncap,), 0) < ngroups
    if payload.kind == "count":
        return jnp.where(gsel, gvs[0], 0), None
    if payload.kind == "avg":
        return (gvs[0].astype(jnp.float64)
                / jnp.maximum(gc, 1), (gc == 0) | ~gsel)
    if payload.kind == "avg_wide":
        return (_compose_f64(gvs[0], gvs[1])
                / jnp.maximum(gc, 1), (gc == 0) | ~gsel)
    if payload.kind == "sum_wide":
        return _finalize_wide(gvs[0], gvs[1]), (gc == 0) | ~gsel
    return gvs[0], (gc == 0) | ~gsel


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
    if payload.kind in _WIDE_KINDS:
        v64 = jnp.where(first_occ, data_s.astype(jnp.int64),
                        jnp.zeros((), jnp.int64))
        lo, hi = _split_limbs(v64)
        slo, shi = lo.sum(), hi.sum()
        if payload.kind == "avg_wide":
            return _compose_f64(slo, shi) / jnp.maximum(cnt, 1), cnt == 0
        return _finalize_wide(slo, shi), cnt == 0
    if payload.kind == "product":
        s = jnp.where(first_occ, data_s.astype(jnp.float64), 1.0).prod()
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
        elif p.kind in _WIDE_KINDS:
            lo, hi = _split_limbs(p.data.astype(jnp.int64))
            z = jnp.zeros((), jnp.int64)
            slo = jnp.stack([jnp.where(m, lo, z).sum() for m in live_masks])
            shi = jnp.stack([jnp.where(m, hi, z).sum() for m in live_masks])
            if p.kind == "avg_wide":
                results.append((_compose_f64(slo, shi)
                                / jnp.maximum(nn, 1), nn == 0))
            else:
                results.append((_finalize_wide(slo, shi), nn == 0))
        elif p.kind in ("min", "max"):
            big = _extreme(p.data.dtype, p.kind)
            red = (jnp.min if p.kind == "min" else jnp.max)
            s = jnp.stack([red(jnp.where(m, p.data, big))
                           for m in live_masks])
            results.append((s, nn == 0))
        elif p.kind == "any_value":
            idxs = jnp.stack([jnp.argmax(m) for m in live_masks])
            results.append((p.data[idxs], nn == 0))
        elif p.kind == "product":
            d = p.data.astype(jnp.float64)
            s = jnp.stack([jnp.where(m, d, 1.0).prod()
                           for m in live_masks])
            results.append((s, nn == 0))
        elif p.kind in _VAR_KINDS:
            d = p.data.astype(jnp.float64)
            z = jnp.zeros((), jnp.float64)
            s1 = jnp.stack([jnp.where(m, d, z).sum() for m in live_masks])
            s2 = jnp.stack([jnp.where(m, d * d, z).sum()
                            for m in live_masks])
            v, bad = _finalize_var(p.kind, s1, s2, nn)
            results.append((v, bad))
        elif p.kind in _COVAR_KINDS:
            x = p.data.astype(jnp.float64)
            y = p.data2.astype(jnp.float64)
            z = jnp.zeros((), jnp.float64)
            sx = jnp.stack([jnp.where(m, x, z).sum() for m in live_masks])
            sy = jnp.stack([jnp.where(m, y, z).sum() for m in live_masks])
            sxy = jnp.stack([jnp.where(m, x * y, z).sum()
                             for m in live_masks])
            sxx = jnp.stack([jnp.where(m, x * x, z).sum()
                             for m in live_masks])
            syy = jnp.stack([jnp.where(m, y * y, z).sum()
                             for m in live_masks])
            v, bad = _finalize_covar(p.kind, sx, sy, sxy, sxx, syy, nn)
            results.append((v, bad))
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
        elif p.kind in _WIDE_KINDS:
            v64 = jnp.where(live, p.data.astype(jnp.int64),
                            jnp.zeros((), jnp.int64))
            lo, hi = _split_limbs(v64)
            slo, shi = lo.sum(), hi.sum()
            if p.kind == "avg_wide":
                results.append((_compose_f64(slo, shi)
                                / jnp.maximum(cnt, 1), cnt == 0))
            else:
                results.append((_finalize_wide(slo, shi), cnt == 0))
        elif p.kind == "product":
            v = jnp.where(live, p.data.astype(jnp.float64), 1.0)
            results.append((v.prod(), cnt == 0))
        elif p.kind in ("min", "max"):
            big = _extreme(p.data.dtype, p.kind)
            v = jnp.where(live, p.data, big)
            r = v.min() if p.kind == "min" else v.max()
            results.append((r, cnt == 0))
        elif p.kind == "any_value":
            idx = jnp.argmax(live)
            results.append((p.data[idx], cnt == 0))
        elif p.kind == "last":
            cap = live.shape[0]
            pos = lax.broadcasted_iota(jnp.int64, (cap,), 0)
            idx = jnp.max(jnp.where(live, pos, -1))
            results.append((p.data[jnp.maximum(idx, 0)], cnt == 0))
        elif p.kind in BIT_KINDS:
            neutral = jnp.asarray(_BIT_NEUTRAL[p.kind],
                                  dtype=p.data.dtype)
            v = jnp.where(live, p.data, neutral)
            bop = _BIT_OPS[p.kind]
            r = lax.reduce(v, neutral,
                           lambda a, b2: bop(a, b2), (0,))
            results.append((r, cnt == 0))
        elif p.kind in _VAR_KINDS:
            x = jnp.where(live, p.data.astype(jnp.float64), 0.0)
            out, bad = _finalize_var(p.kind, x.sum(), (x * x).sum(), cnt)
            results.append((out, bad))
        elif p.kind in _COVAR_KINDS:
            x = jnp.where(live, p.data.astype(jnp.float64), 0.0)
            y = jnp.where(live, p.data2.astype(jnp.float64), 0.0)
            out, bad = _finalize_covar(
                p.kind, x.sum(), y.sum(), (x * y).sum(), (x * x).sum(),
                (y * y).sum(), cnt)
            results.append((out, bad))
        else:
            raise NotImplementedError(p.kind)
    return results


def group_entropy(key_ops, value_ops, payload: AggPayload, sel,
                  num_groups_cap: int):
    """Shannon entropy (log2) of the value distribution per group
    (reference: core_functions/aggregate/distributive/entropy.cpp —
    theirs builds a hash map of counts; ours sorts (group, value) and
    turns run lengths into  log2(n) - sum(c*log2 c)/n,  scatter-free."""
    cap = sel.shape[0]
    invalid = (~sel).astype(jnp.int32)
    operands = [invalid, *key_ops, *value_ops]
    carried = []
    if payload.nulls is not None:
        carried.append(payload.nulls.astype(jnp.int8))
    sorted_ops = lax.sort(operands + carried, num_keys=len(operands),
                          is_stable=False)
    inv_s = sorted_ops[0]
    keys_s = sorted_ops[1:1 + len(key_ops)]
    vals_s = sorted_ops[1 + len(key_ops):len(operands)]
    nn_s = sorted_ops[len(operands)] if carried else None
    valid_s = inv_s == 0
    notnull = valid_s if nn_s is None else (valid_s & (nn_s == 0))

    kdiff = jnp.zeros(cap, dtype=bool).at[0].set(True)
    for k in keys_s:
        kdiff = kdiff | jnp.concatenate(
            [jnp.ones(1, dtype=bool), k[1:] != k[:-1]])
    vdiff = kdiff
    for v in vals_s:
        vdiff = vdiff | jnp.concatenate(
            [jnp.ones(1, dtype=bool), v[1:] != v[:-1]])
    g_boundary = kdiff & valid_s
    run_boundary = vdiff

    # run length of non-null rows, evaluated at run-end rows (a run also
    # ends where the invalid tail begins — invalid rows can share the
    # preceding run's encoded value)
    run_cnt = _seg_sum_scan(run_boundary, notnull.astype(jnp.int64))
    nxt_run = jnp.concatenate([run_boundary[1:], jnp.ones(1, dtype=bool)]) \
        | jnp.concatenate([~valid_s[1:], jnp.ones(1, dtype=bool)])
    contrib = jnp.where(nxt_run & notnull & (run_cnt > 0),
                        run_cnt.astype(jnp.float64)
                        * jnp.log2(jnp.maximum(run_cnt, 1)
                                   .astype(jnp.float64)),
                        0.0)
    csum = _seg_sum_scan(g_boundary, contrib)
    n_live = _seg_sum_scan(g_boundary, notnull.astype(jnp.int64))

    # compact group-end rows (same scheme as group_and_aggregate)
    nxt_g = jnp.concatenate([g_boundary[1:], jnp.ones(1, dtype=bool)])
    nxt_inv = jnp.concatenate([~valid_s[1:], jnp.ones(1, dtype=bool)])
    is_last = valid_s & (nxt_g | nxt_inv)
    ngroups = g_boundary.sum().astype(jnp.int32)
    pos = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    not_last = (~is_last).astype(jnp.int32)
    _, _, csum_c, n_c = lax.sort([not_last, pos, csum, n_live],
                                 num_keys=2, is_stable=False)
    ncap = num_groups_cap
    gsel = lax.broadcasted_iota(jnp.int32, (ncap,), 0) < ngroups
    csum_g = csum_c[:ncap]
    n_g = n_c[:ncap]
    nf = jnp.maximum(n_g, 1).astype(jnp.float64)
    out = jnp.log2(nf) - csum_g / nf
    return out, (~gsel) | (n_g == 0)


def ungrouped_entropy(value_ops, payload: AggPayload, sel):
    cap = sel.shape[0]
    live = sel if payload.nulls is None else (sel & ~payload.nulls)
    inv = (~live).astype(jnp.int32)
    sorted_ops = lax.sort([inv, *value_ops], num_keys=1 + len(value_ops),
                          is_stable=False)
    live_s = sorted_ops[0] == 0
    vals_s = sorted_ops[1:]
    vdiff = jnp.zeros(cap, dtype=bool).at[0].set(True)
    for v in vals_s:
        vdiff = vdiff | jnp.concatenate(
            [jnp.ones(1, dtype=bool), v[1:] != v[:-1]])
    run_cnt = _seg_sum_scan(vdiff, live_s.astype(jnp.int64))
    nxt_run = jnp.concatenate([vdiff[1:], jnp.ones(1, dtype=bool)]) \
        | jnp.concatenate([~live_s[1:], jnp.ones(1, dtype=bool)])
    contrib = jnp.where(nxt_run & live_s & (run_cnt > 0),
                        run_cnt.astype(jnp.float64)
                        * jnp.log2(jnp.maximum(run_cnt, 1)
                                   .astype(jnp.float64)),
                        0.0)
    n = live.astype(jnp.int64).sum()
    nf = jnp.maximum(n, 1).astype(jnp.float64)
    return jnp.log2(nf) - contrib.sum() / nf, n == 0


# ---------------------------------------------------------------------------
# holistic aggregates: quantile / median (reference: holistic aggregates in
# extension/core_functions/aggregate/holistic/) — sort-based positional
# selection, fully vectorized.
# ---------------------------------------------------------------------------

def group_quantile(key_ops, value_ops, payload: AggPayload, q: float,
                   sel, num_groups_cap: int, interpolate: bool):
    """Per-group quantile of payload.data ordered by value_ops.
    Group order matches group_and_aggregate over the same key_ops.
    Returns (result float64|value dtype, isnull)."""
    cap = sel.shape[0]
    # groups are formed over ALL selected rows (a group whose payload is
    # entirely NULL still exists — it must stay aligned with
    # group_and_aggregate's group list); within each group, live
    # (non-NULL-payload) rows sort first so the group start is the
    # quantile base and the live count is the scan value at group end
    excl = (~sel).astype(jnp.int32)
    live = sel if payload.nulls is None else (sel & ~payload.nulls)
    inv_live = (~live).astype(jnp.int32)
    operands = [excl, *key_ops, inv_live, *value_ops]
    sorted_ops = lax.sort(operands + [payload.data],
                          num_keys=len(operands), is_stable=False)
    excl_s = sorted_ops[0]
    keys_s = sorted_ops[1:1 + len(key_ops)]
    live_s = sorted_ops[1 + len(key_ops)] == 0
    data_s = sorted_ops[-1]
    sel_s = excl_s == 0

    kdiff = jnp.zeros(cap, dtype=bool).at[0].set(True)
    for k in keys_s:
        kdiff = kdiff | jnp.concatenate(
            [jnp.ones(1, dtype=bool), k[1:] != k[:-1]])
    boundary = kdiff & sel_s
    ngroups = boundary.sum().astype(jnp.int32)
    cnt_scan = _seg_sum_scan(boundary, live_s.astype(jnp.int64))

    # group start positions via compaction of boundary rows
    pos = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    not_b = (~boundary).astype(jnp.int32)
    _, starts = lax.sort([not_b, pos], num_keys=2)
    ncap = num_groups_cap
    starts = starts[:ncap]
    gsel = lax.broadcasted_iota(jnp.int32, (ncap,), 0) < ngroups

    # per-group live count = value of cnt_scan at group end; group end =
    # next start - 1 (last group: total selected count - 1)
    total_sel = sel_s.astype(jnp.int32).sum()
    nxt = jnp.concatenate([starts[1:], jnp.full(1, 0, starts.dtype)])
    idx = lax.broadcasted_iota(jnp.int32, (ncap,), 0)
    ends = jnp.where(idx == ngroups - 1, total_sel - 1,
                     jnp.where(gsel, nxt - 1, 0))
    cnts = jnp.clip(cnt_scan[jnp.clip(ends, 0, cap - 1)], 0, None)
    cnts = jnp.where(gsel, cnts, 0)

    # positions of the quantile element(s)
    frac = q * (cnts.astype(jnp.float64) - 1)
    lo_off = jnp.clip(jnp.floor(frac).astype(jnp.int64), 0, None)
    hi_off = jnp.clip(jnp.ceil(frac).astype(jnp.int64), 0, None)
    lo_idx = jnp.clip(starts.astype(jnp.int64) + lo_off, 0, cap - 1)
    hi_idx = jnp.clip(starts.astype(jnp.int64) + hi_off, 0, cap - 1)
    vlo = data_s[lo_idx]
    vhi = data_s[hi_idx]
    isnull = (cnts == 0) | ~gsel
    if interpolate:
        w = frac - jnp.floor(frac)
        out = vlo.astype(jnp.float64) * (1 - w) \
            + vhi.astype(jnp.float64) * w
        return out, isnull
    return vlo, isnull


def ungrouped_quantile(value_ops, payload: AggPayload, q: float, sel,
                       interpolate: bool):
    live = sel if payload.nulls is None else (sel & ~payload.nulls)
    invalid = (~live).astype(jnp.int32)
    sorted_ops = lax.sort([invalid, *value_ops, payload.data],
                          num_keys=1 + len(value_ops), is_stable=False)
    data_s = sorted_ops[-1]
    cnt = live.astype(jnp.int64).sum()
    frac = q * (cnt.astype(jnp.float64) - 1)
    lo = jnp.clip(jnp.floor(frac).astype(jnp.int64), 0, None)
    hi = jnp.clip(jnp.ceil(frac).astype(jnp.int64), 0, None)
    vlo = data_s[jnp.clip(lo, 0, data_s.shape[0] - 1)]
    vhi = data_s[jnp.clip(hi, 0, data_s.shape[0] - 1)]
    if interpolate:
        w = frac - jnp.floor(frac)
        return (vlo.astype(jnp.float64) * (1 - w)
                + vhi.astype(jnp.float64) * w), cnt == 0
    return vlo, cnt == 0


def group_mode(key_ops, value_ops, payload: AggPayload, sel,
               num_groups_cap: int):
    """Per-group most frequent value (reference: holistic mode,
    extension/core_functions/aggregate/holistic/mode.cpp — theirs hashes
    per group; ours is two sorts + a segmented run-length scan, ties
    break to the smallest value for determinism).  Group order matches
    group_and_aggregate over the same key_ops."""
    cap = sel.shape[0]
    excl = (~sel).astype(jnp.int32)
    live = sel if payload.nulls is None else (sel & ~payload.nulls)
    inv_live = (~live).astype(jnp.int32)
    operands = [excl, *key_ops, inv_live, *value_ops]
    sorted_ops = lax.sort(operands + [payload.data],
                          num_keys=len(operands), is_stable=False)
    excl_s = sorted_ops[0]
    keys_s = sorted_ops[1:1 + len(key_ops)]
    live_s = sorted_ops[1 + len(key_ops)] == 0
    vals_s = sorted_ops[2 + len(key_ops):-1]
    data_s = sorted_ops[-1]
    sel_s = excl_s == 0

    first = jnp.zeros(cap, dtype=bool).at[0].set(True)
    kdiff = first
    for k in keys_s:
        kdiff = kdiff | jnp.concatenate(
            [jnp.ones(1, dtype=bool), k[1:] != k[:-1]])
    vdiff = kdiff
    for v in vals_s:
        vdiff = vdiff | jnp.concatenate(
            [jnp.ones(1, dtype=bool), v[1:] != v[:-1]])
    # run-length of each (group, value) run among live rows; the run's
    # LAST row carries the full count
    run_cnt = _seg_sum_scan(vdiff, live_s.astype(jnp.int64))
    run_end = jnp.concatenate([vdiff[1:], jnp.ones(1, dtype=bool)])
    cand = live_s & run_end

    # second sort keeps groups CONTIGUOUS (unselected rows last, group
    # keys next) and, within each group, orders candidate run-end rows
    # first by (-count, value) — so a group's first row is its mode
    # when it has any live rows, and ties break to the smallest value
    inv_cand = (~cand).astype(jnp.int32)
    neg_cnt = (-run_cnt).astype(jnp.int64)
    ops2 = [excl_s, *keys_s, inv_cand, neg_cnt, *vals_s]
    sorted2 = lax.sort(ops2 + [data_s], num_keys=len(ops2),
                       is_stable=False)
    sel2 = sorted2[0] == 0
    keys2 = sorted2[1:1 + len(key_ops)]
    cand2 = sorted2[1 + len(key_ops)] == 0
    data2 = sorted2[-1]

    kdiff2 = first
    for k in keys2:
        kdiff2 = kdiff2 | jnp.concatenate(
            [jnp.ones(1, dtype=bool), k[1:] != k[:-1]])
    boundary2 = kdiff2 & sel2
    ngroups = boundary2.sum().astype(jnp.int32)
    pos = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    not_b = (~boundary2).astype(jnp.int32)
    _, starts = lax.sort([not_b, pos], num_keys=2)
    ncap = num_groups_cap
    starts = starts[:ncap]
    gsel = lax.broadcasted_iota(jnp.int32, (ncap,), 0) < ngroups
    sidx = jnp.clip(starts, 0, cap - 1)
    out = data2[sidx]
    isnull = ~gsel | ~cand2[sidx]
    return out, isnull


def group_argext(key_ops, by_ops, by_nulls, payload: AggPayload, sel,
                 num_groups_cap: int, is_max: bool,
                 keep_null_payload: bool = False):
    """arg_min/arg_max: payload value at the row where the BY key is
    extremal, per group (reference: arg_min_max.cpp; ours is one sort —
    BY-extremal rows sort first within each group).  Rows where either
    the BY key or the payload is NULL are ignored, so the result falls
    back to the next-extremal row with a non-NULL payload (matching
    arg_min_max.cpp); ties break deterministically by the sort."""
    cap = sel.shape[0]
    excl = (~sel).astype(jnp.int32)
    live = sel if by_nulls is None else (sel & ~by_nulls)
    pnull = payload.nulls if payload.nulls is not None \
        else jnp.zeros(cap, dtype=bool)
    if payload.nulls is not None and not keep_null_payload:
        # arg_min/arg_max skip NULL payloads; the _null variants keep
        # them (reference: arg_min_max.cpp ArgMinMaxNull)
        live = live & ~payload.nulls
    inv_live = (~live).astype(jnp.int32)
    ops = [~o for o in by_ops] if is_max else list(by_ops)
    operands = [excl, *key_ops, inv_live, *ops]
    sorted_ops = lax.sort(operands + [payload.data,
                                      pnull.astype(jnp.int8)],
                          num_keys=len(operands), is_stable=False)
    excl_s = sorted_ops[0]
    keys_s = sorted_ops[1:1 + len(key_ops)]
    live_s = sorted_ops[1 + len(key_ops)] == 0
    data_s = sorted_ops[len(operands)]
    sel_s = excl_s == 0

    kdiff = jnp.zeros(cap, dtype=bool).at[0].set(True)
    for k in keys_s:
        kdiff = kdiff | jnp.concatenate(
            [jnp.ones(1, dtype=bool), k[1:] != k[:-1]])
    boundary = kdiff & sel_s
    ngroups = boundary.sum().astype(jnp.int32)
    pos = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    not_b = (~boundary).astype(jnp.int32)
    _, starts = lax.sort([not_b, pos], num_keys=2)
    starts = starts[:num_groups_cap]
    gsel = lax.broadcasted_iota(jnp.int32, (num_groups_cap,), 0) \
        < ngroups
    pnull_s = sorted_ops[len(operands) + 1]
    sidx = jnp.clip(starts, 0, cap - 1)
    out = data_s[sidx]
    isnull = ~gsel | ~live_s[sidx]
    if keep_null_payload:
        isnull = isnull | (pnull_s[sidx] != 0)
    return out, isnull


def ungrouped_argext(by_ops, by_nulls, payload: AggPayload, sel,
                     is_max: bool, keep_null_payload: bool = False):
    cap = sel.shape[0]
    live = sel if by_nulls is None else (sel & ~by_nulls)
    pnull = payload.nulls if payload.nulls is not None \
        else jnp.zeros(cap, dtype=bool)
    if payload.nulls is not None and not keep_null_payload:
        live = live & ~payload.nulls
    inv = (~live).astype(jnp.int32)
    ops = [~o for o in by_ops] if is_max else list(by_ops)
    sorted_ops = lax.sort([inv, *ops, payload.data,
                           pnull.astype(jnp.int8)],
                          num_keys=1 + len(ops), is_stable=False)
    live0 = sorted_ops[0][0] == 0
    v = sorted_ops[1 + len(ops)][0]
    isn = ~live0
    if keep_null_payload:
        isn = isn | (sorted_ops[2 + len(ops)][0] != 0)
    return v, isn


def ungrouped_mode(value_ops, payload: AggPayload, sel):
    """Most frequent value over all selected rows (ties -> smallest)."""
    cap = sel.shape[0]
    live = sel if payload.nulls is None else (sel & ~payload.nulls)
    invalid = (~live).astype(jnp.int32)
    sorted_ops = lax.sort([invalid, *value_ops, payload.data],
                          num_keys=1 + len(value_ops), is_stable=False)
    inv_s = sorted_ops[0]
    vals_s = sorted_ops[1:-1]
    data_s = sorted_ops[-1]
    live_s = inv_s == 0
    first = jnp.zeros(cap, dtype=bool).at[0].set(True)
    vdiff = first
    for v in vals_s:
        vdiff = vdiff | jnp.concatenate(
            [jnp.ones(1, dtype=bool), v[1:] != v[:-1]])
    run_cnt = _seg_sum_scan(vdiff, live_s.astype(jnp.int64))
    run_end = jnp.concatenate([vdiff[1:], jnp.ones(1, dtype=bool)])
    cand = live_s & run_end
    score = jnp.where(cand, run_cnt, 0)
    # argmax returns the FIRST max — values ascend, so ties break small
    idx = jnp.argmax(score)
    return data_s[idx], live_s.sum() == 0
