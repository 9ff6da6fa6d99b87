"""Physical execution of bound logical plans.

The TPU analog of the reference's PhysicalOperator/PipelineExecutor stack
(reference: src/execution/physical_operator.hpp:36, parallel/
pipeline_executor.cpp).  Differences by design:

* Operators are pure functions over whole-column Batches, jit-compiled once
  per plan node (XLA fuses scan+filter+project chains into single kernels —
  the reference fuses manually via its streaming-operator loop).
* Dynamic cardinalities (join fan-out, group counts, post-filter
  compaction) are decided on host between jitted stages with power-of-two
  capacity bucketing — the TPU answer to HAVE_MORE_OUTPUT / chunked
  ScanStructure::Next probing (reference: physical_hash_join.cpp:973-1045).
* Aggregation picks a perfect-hash path (dense small key domain — analog
  of reference's PerfectHashAggregate, perfect_aggregate_hashtable.cpp)
  or the general sort/segment path (ops/aggregate.py).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from .. import types as T
from ..batch import Batch, Column, Schema, bucket_capacity, make_batch
from ..expr import ir
from ..expr.compile import evaluate, select_mask
from ..ops import aggregate as agg_ops
from ..ops import join as join_ops
from ..ops import order as order_ops
from ..ops import sortkey
from ..types import TypeId
from . import logical as L


class ExecutionContext:
    """Per-query execution state (profiling hooks land here)."""

    def __init__(self, profiler=None):
        self.profiler = profiler


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _node_jit(node, key, fn, static_argnums=()):
    """One jax.jit per (plan node, kernel); jit itself caches on shapes."""
    cache = getattr(node, "_kern_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(node, "_kern_cache", cache) \
            if hasattr(node, "__dataclass_fields__") else setattr(
                node, "_kern_cache", cache)
    if key not in cache:
        cache[key] = jax.jit(fn, static_argnums=static_argnums)
    return cache[key]


def _live_count(batch: Batch) -> int:
    return int(batch.count)


def _compact(batch: Batch, new_cap: int) -> Batch:
    """Move live rows to the front and shrink capacity — one stable sort
    carrying every column (linear; no random gathers)."""
    cap = batch.sel.shape[0]
    invalid = (~batch.sel).astype(jnp.int32)
    pos = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    carried = []
    for c in batch.columns:
        carried.append(c.data)
        if c.nulls is not None:
            carried.append(c.nulls.astype(jnp.int8))
    out = lax.sort([invalid, pos, *carried], num_keys=2, is_stable=False)
    sel = (out[0] == 0)[:new_cap]
    rest = out[2:]
    cols = []
    i = 0
    for c in batch.columns:
        d = rest[i][:new_cap]
        i += 1
        n = None
        if c.nulls is not None:
            n = rest[i][:new_cap] != 0
            i += 1
        cols.append(Column(d, n))
    return Batch(tuple(cols), sel, batch.count)


def maybe_compact(node, batch: Batch, force: bool = False) -> Batch:
    """Shrink capacity when live rows occupy < half the batch."""
    n = _live_count(batch)
    want = bucket_capacity(n)
    if force and want < batch.capacity or want <= batch.capacity // 2:
        fn = _node_jit(node, ("compact", want),
                       functools.partial(_compact, new_cap=want))
        return fn(batch)
    return batch


def _joinable_int64(data, dtype) -> jnp.ndarray:
    """Map a key column to int64 such that equality is preserved."""
    if dtype.id in (TypeId.FLOAT, TypeId.DOUBLE):
        d = data.astype(jnp.float64)
        d = jnp.where(d == 0.0, 0.0, d)          # canonicalize -0.0
        return lax.bitcast_convert_type(d, jnp.int64)
    return data.astype(jnp.int64)


# ---------------------------------------------------------------------------
# executor
# ---------------------------------------------------------------------------

def execute(node: L.LogicalNode, ctx: Optional[ExecutionContext] = None
            ) -> Tuple[Schema, Batch]:
    ctx = ctx or ExecutionContext()
    fn = _EXEC[type(node)]
    if ctx.profiler is not None:
        with ctx.profiler.operator(type(node).__name__, node):
            schema, batch = fn(node, ctx)
            ctx.profiler.record_cardinality(node, batch)
        return schema, batch
    return fn(node, ctx)


def _exec_get(node: L.Get, ctx):
    batch = node.table.device_batch(node.column_indices)
    if node.filters:
        pred = ir.make_and(node.filters)

        def kern(b):
            m = select_mask(pred, b)
            return Batch(b.columns, m, m.astype(jnp.int32).sum())

        batch = _node_jit(node, "scan_filter", kern)(batch)
        batch = maybe_compact(node, batch)
    return node.schema, batch


def _exec_filter(node: L.Filter, ctx):
    schema, batch = execute(node.child, ctx)

    def kern(b):
        m = select_mask(node.predicate, b)
        return Batch(b.columns, m, m.astype(jnp.int32).sum())

    batch = _node_jit(node, "filter", kern)(batch)
    return node.schema, maybe_compact(node, batch)


def _exec_project(node: L.Project, ctx):
    schema, batch = execute(node.child, ctx)

    def kern(b):
        cols = []
        for e in node.exprs:
            d, n = evaluate(e, b)
            cols.append(Column(d, n))
        return Batch(tuple(cols), b.sel, b.count)

    return node.schema, _node_jit(node, "project", kern)(batch)


# ---- aggregation ----------------------------------------------------------

def _perfect_hash_domain(node: L.Aggregate):
    """If every group key has a small dense domain, return per-key domain
    sizes (else None).  VARCHAR dict codes and BOOLEAN qualify.  The
    masked-loop dense path only pays off for tiny domains (Q1-style)."""
    sizes = []
    for g in node.groups:
        sd = getattr(g, "strdict", None)
        if g.dtype.id == TypeId.VARCHAR and sd is not None:
            sizes.append(len(sd) + 1)          # +1 for NULL slot
        elif g.dtype.id == TypeId.BOOLEAN:
            sizes.append(3)
        else:
            return None
    total = 1
    for s in sizes:
        total *= s
    if total > agg_ops.MAX_MASKED_DOMAIN:
        return None
    return sizes


def _payloads(node: L.Aggregate, b: Batch):
    ps = []
    for a in node.aggs:
        if a.kind == "count_star":
            ps.append(agg_ops.AggPayload("count_star", None, None))
            continue
        d, n = evaluate(a.arg, b)
        d2 = None
        if a.arg2 is not None:
            d2, n2 = evaluate(a.arg2, b)
            if n2 is not None:
                n = n2 if n is None else (n | n2)
        kind = a.kind
        if kind == "sum" and a.arg.dtype.id in (TypeId.FLOAT,
                                                TypeId.DOUBLE):
            kind = "sum_float"
        ps.append(agg_ops.AggPayload(kind, d, n, d2))
    return ps


def _agg_output(node: L.Aggregate, group_cols, agg_results, gsel, ngroups,
                gcap):
    cols = []
    for (d, n) in group_cols:
        cols.append(Column(d, n))
    for a, (d, n) in zip(node.aggs, agg_results):
        if (a.kind == "avg" or (a.kind == "quantile" and a.interpolate)) \
                and a.arg is not None \
                and a.arg.dtype.id == TypeId.DECIMAL:
            # integer sum was in fixed-point: scale back to a true double
            d = d / T.decimal_scale_factor(a.arg.dtype.scale)
        want = np.dtype(a.dtype.np_dtype)
        if d.dtype != want:
            d = d.astype(want)
        cols.append(Column(d, n))
    return Batch(tuple(cols), gsel, ngroups)


def _exec_aggregate(node: L.Aggregate, ctx):
    schema, batch = execute(node.child, ctx)

    if not node.groups:
        def kern(b):
            ps = _payloads(node, b)
            res = []
            for spec, p in zip(node.aggs, ps):
                if spec.kind == "quantile":
                    vops = sortkey.encode_key(p.data, p.nulls,
                                              spec.arg.dtype)
                    res.append(agg_ops.ungrouped_quantile(
                        vops, p, spec.quantile, b.sel, spec.interpolate))
                elif spec.distinct and spec.kind != "count_star":
                    vops = sortkey.encode_key(p.data, p.nulls,
                                              spec.arg.dtype)
                    res.append(agg_ops.ungrouped_distinct(vops, p, b.sel))
                else:
                    res.append(agg_ops.ungrouped_aggregate([p], b.sel)[0])
            cols = []
            for a, (v, isn) in zip(node.aggs, res):
                if (a.kind == "avg"
                        or (a.kind == "quantile" and a.interpolate)) \
                        and a.arg is not None \
                        and a.arg.dtype.id == TypeId.DECIMAL:
                    v = v / T.decimal_scale_factor(a.arg.dtype.scale)
                want = np.dtype(a.dtype.np_dtype)
                d = jnp.zeros(128, dtype=want).at[0].set(v.astype(want))
                n = None
                if isn is not None:
                    n = jnp.zeros(128, dtype=bool).at[0].set(isn)
                cols.append(Column(d, n))
            sel = jnp.zeros(128, dtype=bool).at[0].set(True)
            return Batch(tuple(cols), sel, jnp.int32(1))

        return node.schema, _node_jit(node, "ungrouped", kern)(batch)

    has_distinct = any(a.distinct and a.kind != "count_star"
                       for a in node.aggs)
    sizes = None if has_distinct else _perfect_hash_domain(node)
    if sizes is not None:
        strides = []
        acc = 1
        for s in reversed(sizes):
            strides.append(acc)
            acc *= s
        strides = list(reversed(strides))
        domain = acc

        def kern(b):
            gid = jnp.zeros(b.sel.shape[0], dtype=jnp.int32)
            key_cols = []
            for g, size, stride in zip(node.groups, sizes, strides):
                d, n = evaluate(g, b)
                code = d.astype(jnp.int32)
                if n is not None:
                    code = jnp.where(n, size - 1, code)
                key_cols.append((d, n))
                gid = gid + code * stride
            ps = _payloads(node, b)
            results, counts = agg_ops.dense_group_aggregate(
                gid, domain, ps, b.sel)
            gsel = counts > 0
            # reconstruct key values from dense slot code
            slot = lax.broadcasted_iota(jnp.int32, (domain,), 0)
            group_cols = []
            for (dcol, ncol), size, stride in zip(key_cols, sizes,
                                                  strides):
                code = (slot // stride) % size
                isnull = code == (size - 1)
                group_cols.append((code.astype(dcol.dtype), isnull))
            return _agg_output(node, group_cols, results, gsel,
                               gsel.astype(jnp.int32).sum(), domain)

        batch = _node_jit(node, "perfect_agg", kern)(batch)
        return node.schema, maybe_compact(node, batch, force=True)

    # general sort-based path
    def kern(b):
        key_ops, key_data = [], []
        for g in node.groups:
            d, n = evaluate(g, b)
            key_ops.extend(sortkey.encode_key(d, n, g.dtype))
            key_data.append((d, n))
        ps = _payloads(node, b)
        gcap = b.sel.shape[0]

        def is_special(a):
            return a.kind == "quantile" or (a.distinct
                                            and a.kind != "count_star")

        plain = [(i, p) for i, (a, p) in enumerate(zip(node.aggs, ps))
                 if not is_special(a)]
        group_cols, plain_res, gsel, ng = agg_ops.group_and_aggregate(
            key_ops, key_data, [p for _, p in plain], b.sel, gcap)
        results = [None] * len(ps)
        for (i, _), r in zip(plain, plain_res):
            results[i] = r
        for i, (a, p) in enumerate(zip(node.aggs, ps)):
            if a.kind == "quantile":
                vops = sortkey.encode_key(p.data, p.nulls, a.arg.dtype)
                results[i] = agg_ops.group_quantile(
                    key_ops, vops, p, a.quantile, b.sel, gcap,
                    a.interpolate)
            elif a.distinct and a.kind != "count_star":
                vops = sortkey.encode_key(p.data, p.nulls, a.arg.dtype)
                results[i] = agg_ops.group_distinct_aggregate(
                    key_ops, vops, p, b.sel, gcap)
        return _agg_output(node, group_cols, results, gsel, ng, gcap)

    batch = _node_jit(node, "sort_agg", kern)(batch)
    return node.schema, maybe_compact(node, batch, force=True)


# ---- joins ----------------------------------------------------------------

def _key_arrays(conds: List[L.JoinCond], b: Batch, side: str):
    datas, nulls = [], []
    for c in conds:
        e = c.left if side == "left" else c.right
        d, n = evaluate(e, b)
        datas.append(_joinable_int64(d, e.dtype))
        nulls.append(n)
    return datas, nulls


def _combine_live(sel, nulls):
    live = sel
    for n in nulls:
        if n is not None:
            live = live & ~n
    return live


def _densify_keys(lds, l_live, rds, r_live):
    """Multi-key join: assign dense ids by group-sorting both sides together
    (exact, collision-free; the analog of key-normalizing both inputs).
    Returns int64 ids per side; rows not live get sentinel -1."""
    nl, nr = lds[0].shape[0], rds[0].shape[0]
    n = nl + nr
    ops = []
    live = jnp.concatenate([l_live, r_live])
    inv = (~live).astype(jnp.int32)
    ops.append(inv)
    for ld, rd in zip(lds, rds):
        ops.append(jnp.concatenate([ld, rd]))
    rowid = lax.broadcasted_iota(jnp.int32, (n,), 0)
    ops.append(rowid)
    sorted_ops = lax.sort(ops, num_keys=len(ops) - 1, is_stable=True)
    inv_s, keys_s, rid_s = sorted_ops[0], sorted_ops[1:-1], sorted_ops[-1]
    valid_s = inv_s == 0
    diff = jnp.zeros(n, dtype=bool).at[0].set(True)
    for k in keys_s:
        diff = diff | jnp.concatenate(
            [jnp.ones(1, dtype=bool), k[1:] != k[:-1]])
    boundary = diff & valid_s
    gid = jnp.cumsum(boundary.astype(jnp.int64)) - 1
    gid = jnp.where(valid_s, gid, -1)
    out = jnp.zeros(n, dtype=jnp.int64).at[rid_s].set(gid)
    return out[:nl], out[nl:]


def _exec_join(node: L.Join, ctx):
    lschema, lb = execute(node.left, ctx)
    rschema, rb = execute(node.right, ctx)

    # build side compaction keeps the sorted build small
    rb = maybe_compact(node.right, rb)

    def keys_kern(lb, rb):
        lds, lns = _key_arrays(node.conds, lb, "left")
        rds, rns = _key_arrays(node.conds, rb, "right")
        l_live = _combine_live(lb.sel, lns)
        r_live = _combine_live(rb.sel, rns)
        if len(lds) == 1:
            lk, rk = lds[0], rds[0]
        else:
            lk, rk = _densify_keys(lds, l_live, rds, r_live)
            l_live = l_live & (lk >= 0)
            r_live = r_live & (rk >= 0)
        bt = join_ops.build(rk, None, r_live)
        lo, cnt = join_ops.probe_ranges(bt, lk, None, l_live)
        return bt, lo, cnt, l_live

    bt, lo, cnt, l_live = _node_jit(node, "probe", keys_kern)(lb, rb)
    jt = node.join_type

    if jt in ("semi", "anti", "mark") and node.extra is None:
        def kern(lb, cnt, l_live):
            has = cnt > 0
            if jt == "semi":
                m = lb.sel & has
                return Batch(lb.columns, m, m.astype(jnp.int32).sum())
            if jt == "anti":
                m = lb.sel & ~has
                return Batch(lb.columns, m, m.astype(jnp.int32).sum())
            cols = lb.columns + (Column(has, None),)
            return Batch(cols, lb.sel, lb.count)

        out = _node_jit(node, "semi", kern)(lb, cnt, l_live)
        return node.schema, maybe_compact(node, out)

    if jt in ("semi", "anti", "mark") and node.extra is not None:
        # residual condition: expand matches, filter pairs, then reduce to
        # a per-probe-row matched flag (reference: ScanStructure semi/anti
        # with non-equality conditions, physical_hash_join.cpp)
        total = int(join_ops.match_total(cnt))
        out_cap = bucket_capacity(max(total, 1))

        def match_kern(lb, rb, bt, lo, cnt):
            pi, bpos, valid = join_ops.expand(lo, cnt, out_cap)
            brow = bt.srow[bpos]
            cols = []
            for c in lb.columns:
                cols.append(Column(c.data[pi],
                                   c.nulls[pi] if c.nulls is not None
                                   else None))
            for c in rb.columns:
                cols.append(Column(c.data[brow],
                                   c.nulls[brow] if c.nulls is not None
                                   else None))
            pairs = Batch(tuple(cols), valid, valid.astype(jnp.int32).sum())
            m = select_mask(node.extra, pairs)
            cap_l = lb.sel.shape[0]
            tgt = jnp.where(m, pi, cap_l)
            matched = jnp.zeros(cap_l + 1, dtype=jnp.int32) \
                .at[tgt].max(1, mode="drop")[:cap_l] > 0
            if jt == "semi":
                msel = lb.sel & matched
                return Batch(lb.columns, msel, msel.astype(jnp.int32).sum())
            if jt == "anti":
                msel = lb.sel & ~matched
                return Batch(lb.columns, msel, msel.astype(jnp.int32).sum())
            cols2 = lb.columns + (Column(matched, None),)
            return Batch(cols2, lb.sel, lb.count)

        out = _node_jit(node, ("semi_extra", out_cap), match_kern)(
            lb, rb, bt, lo, cnt)
        return node.schema, maybe_compact(node, out)

    total = int(join_ops.match_total(cnt))
    n_l_extra = 0
    n_r_extra = 0
    if jt in ("left", "full"):
        n_l_extra = _live_count(lb)      # upper bound on unmatched probes
    if jt in ("right", "full"):
        n_r_extra = _live_count(rb)
    out_cap = bucket_capacity(max(total + n_l_extra + n_r_extra, 1))

    def expand_kern(lb, rb, bt, lo, cnt, l_live):
        pi, bpos, valid = join_ops.expand(lo, cnt, out_cap)
        brow = bt.srow[bpos]
        cols = []
        for c in lb.columns:
            d = c.data[pi]
            n = c.nulls[pi] if c.nulls is not None else None
            cols.append(Column(d, n))
        for c in rb.columns:
            d = c.data[brow]
            n = c.nulls[brow] if c.nulls is not None else None
            cols.append(Column(d, n))
        out = Batch(tuple(cols), valid, valid.astype(jnp.int32).sum())
        cap_l = lb.sel.shape[0]
        cap_r = rb.sel.shape[0]
        if node.extra is not None:
            m = select_mask(node.extra, out)
            out = Batch(out.columns, m, m.astype(jnp.int32).sum())
            # matched masks must reflect the residual filter
            p_t = jnp.where(m, pi, cap_l)
            probe_matched = jnp.zeros(cap_l + 1, jnp.int32) \
                .at[p_t].max(1, mode="drop")[:cap_l] > 0
            b_t = jnp.where(m, brow, cap_r)
            build_matched = jnp.zeros(cap_r + 1, jnp.int32) \
                .at[b_t].max(1, mode="drop")[:cap_r] > 0
        else:
            probe_matched = cnt > 0
            build_matched = join_ops.matched_build_mask(bt, lo, cnt, cap_r)
        return out, probe_matched, build_matched

    out, probe_matched, build_matched = _node_jit(
        node, ("expand", out_cap), expand_kern)(lb, rb, bt, lo, cnt, l_live)

    if jt in ("left", "full", "right"):
        parts = [out]
        if jt in ("left", "full"):
            def left_unmatched(lb, probe_matched):
                m = lb.sel & ~probe_matched
                cap = lb.sel.shape[0]
                cols = [Column(c.data, c.nulls) for c in lb.columns]
                for c in rb.columns:
                    cols.append(Column(jnp.zeros(cap, dtype=c.data.dtype),
                                       jnp.ones(cap, dtype=bool)))
                return Batch(tuple(cols), m, m.astype(jnp.int32).sum())

            parts.append(_node_jit(node, "left_outer", left_unmatched)(
                lb, probe_matched))
        if jt in ("right", "full"):
            def right_unmatched(rb, build_matched):
                cap = rb.sel.shape[0]
                m = rb.sel & ~build_matched
                # NULL keys on build side never match; they must appear too
                cols = []
                for c in lb.columns:
                    cols.append(Column(jnp.zeros(cap, dtype=c.data.dtype),
                                       jnp.ones(cap, dtype=bool)))
                for c in rb.columns:
                    cols.append(Column(c.data, c.nulls))
                return Batch(tuple(cols), m, m.astype(jnp.int32).sum())

            parts.append(_node_jit(node, "right_outer", right_unmatched)(
                rb, build_matched))
        out = _concat_batches(node, parts)

    return node.schema, maybe_compact(node, out)


def _concat_batches(node, parts: List[Batch]) -> Batch:
    """Concatenate batches (same column layout), preserving live rows.

    Each part is first compacted (live rows to the front), then statically
    sliced to its host-known live count, so parts pack densely."""
    ns = [_live_count(p) for p in parts]
    total = sum(ns)
    cap = bucket_capacity(max(total, 1))
    compacted = []
    for i, (p, n) in enumerate(zip(parts, ns)):
        c = bucket_capacity(max(n, 1))
        fn = _node_jit(node, ("concat_compact", i, c),
                       functools.partial(_compact, new_cap=c))
        compacted.append(fn(p))

    def kern(*parts):
        ncols = len(parts[0].columns)
        cols = []
        for ci in range(ncols):
            datas, nullsl = [], []
            any_null = any(p.columns[ci].nulls is not None for p in parts)
            for p, n in zip(parts, ns):
                c = p.columns[ci]
                datas.append(c.data[:n])
                if any_null:
                    nullsl.append(c.nulls[:n] if c.nulls is not None
                                  else jnp.zeros(n, dtype=bool))
            d = _pad(jnp.concatenate(datas), cap)
            nn = _pad(jnp.concatenate(nullsl), cap) if any_null else None
            cols.append(Column(d, nn))
        sel = _pad(jnp.concatenate([p.sel[:n]
                                    for p, n in zip(parts, ns)]), cap)
        return Batch(tuple(cols), sel, sel.astype(jnp.int32).sum())

    caps = tuple(p.capacity for p in compacted)
    return _node_jit(node, ("concat", caps, tuple(ns), cap), kern)(*compacted)


def _exec_cross(node: L.CrossProduct, ctx):
    ls, lb = execute(node.left, ctx)
    rs, rb = execute(node.right, ctx)
    lb = maybe_compact(node.left, lb, force=True)
    rb = maybe_compact(node.right, rb, force=True)
    nl, nr = lb.capacity, rb.capacity
    cap = bucket_capacity(nl * nr)

    def kern(lb, rb):
        li = lax.broadcasted_iota(jnp.int32, (nl, nr), 0).reshape(-1)
        ri = lax.broadcasted_iota(jnp.int32, (nl, nr), 1).reshape(-1)
        cols = []
        for c in lb.columns:
            cols.append(Column(_pad(c.data[li], cap),
                               _pad(c.nulls[li], cap)
                               if c.nulls is not None else None))
        for c in rb.columns:
            cols.append(Column(_pad(c.data[ri], cap),
                               _pad(c.nulls[ri], cap)
                               if c.nulls is not None else None))
        sel = _pad(lb.sel[li] & rb.sel[ri], cap)
        return Batch(tuple(cols), sel, sel.astype(jnp.int32).sum())

    return node.schema, _node_jit(node, ("cross", cap), kern)(lb, rb)


def _pad(a, cap):
    pad = cap - a.shape[0]
    if pad <= 0:
        return a[:cap]
    return jnp.concatenate([a, jnp.zeros(pad, dtype=a.dtype)])


# ---- order / limit / distinct / union ------------------------------------

def _exec_order(node: L.Order, ctx):
    schema, batch = execute(node.child, ctx)

    def kern(b):
        key_ops = []
        for k in node.keys:
            d, n = evaluate(k.expr, b)
            key_ops.extend(sortkey.encode_key(
                d, n, k.expr.dtype, desc=k.desc, nulls_last=k.nulls_last))
        # carry all columns through ONE sort (linear data movement) —
        # no post-sort random gathers (docs/PERF_NOTES.md rule 2)
        invalid = (~b.sel).astype(jnp.int32)
        carried = []
        for c in b.columns:
            carried.append(c.data)
            if c.nulls is not None:
                carried.append(c.nulls.astype(jnp.int8))
        nkeys = 1 + len(key_ops)
        out = lax.sort([invalid, *key_ops, *carried], num_keys=nkeys,
                       is_stable=True)
        sel = out[0] == 0
        rest = out[nkeys:]
        cols = []
        i = 0
        for c in b.columns:
            d = rest[i]
            i += 1
            n = None
            if c.nulls is not None:
                n = rest[i] != 0
                i += 1
            cols.append(Column(d, n))
        return Batch(tuple(cols), sel, b.count)

    return node.schema, _node_jit(node, "order", kern)(batch)


def _exec_limit(node: L.Limit, ctx):
    schema, batch = execute(node.child, ctx)
    lim = node.limit if node.limit is not None else 1 << 60

    def kern(b):
        m = order_ops.limit_mask(b.sel, node.offset, lim)
        return Batch(b.columns, m, m.astype(jnp.int32).sum())

    batch = _node_jit(node, "limit", kern)(batch)
    return node.schema, maybe_compact(node, batch)


def _exec_distinct(node: L.Distinct, ctx):
    schema, batch = execute(node.child, ctx)

    def kern(b):
        key_ops, key_data = [], []
        for i, f in enumerate(schema.fields):
            c = b.columns[i]
            key_ops.extend(sortkey.encode_key(c.data, c.nulls, f.dtype))
            key_data.append((c.data, c.nulls))
        gcap = b.sel.shape[0]
        group_cols, _, gsel, ng = agg_ops.group_and_aggregate(
            key_ops, key_data, [], b.sel, gcap)
        cols = tuple(Column(d, n) for d, n in group_cols)
        return Batch(cols, gsel, ng)

    batch = _node_jit(node, "distinct", kern)(batch)
    return node.schema, maybe_compact(node, batch, force=True)


def _exec_window(node: L.Window, ctx):
    from ..ops import window as win_ops
    schema, batch = execute(node.child, ctx)

    # group fns by (partition, order) signature -> one sort per group
    groups = {}
    for i, f in enumerate(node.fns):
        key = (tuple(repr(p) for p in f.partition),
               tuple((repr(k.expr), k.desc, k.nulls_last) for k in f.order))
        groups.setdefault(key, []).append((i, f))

    def kern(b):
        results = [None] * len(node.fns)
        for key, fns in groups.items():
            f0 = fns[0][1]
            part_ops = []
            for p in f0.partition:
                d, n = evaluate(p, b)
                part_ops.extend(sortkey.encode_key(d, n, p.dtype))
            order_ops = []
            for k in f0.order:
                d, n = evaluate(k.expr, b)
                order_ops.extend(sortkey.encode_key(
                    d, n, k.expr.dtype, desc=k.desc,
                    nulls_last=k.nulls_last))
            specs = []
            for i, f in fns:
                data = nulls = None
                kind = f.kind
                if f.arg is not None:
                    data, nulls = evaluate(f.arg, b)
                    if kind == "sum" and f.arg.dtype.id in (
                            TypeId.FLOAT, TypeId.DOUBLE):
                        kind = "sum_float"
                specs.append(win_ops.WindowSpec(
                    kind, data, nulls, f.offset,
                    has_order=bool(f.order),
                    rows_frame=f.frame))
            outs = win_ops.compute_windows(part_ops, order_ops, specs,
                                           b.sel)
            for (i, f), (d, n) in zip(fns, outs):
                if f.kind == "avg" and f.arg is not None \
                        and f.arg.dtype.id == TypeId.DECIMAL:
                    d = d / T.decimal_scale_factor(f.arg.dtype.scale)
                want = np.dtype(f.dtype.np_dtype)
                if d.dtype != want:
                    d = d.astype(want)
                results[i] = Column(d, n)
        cols = list(b.columns) + results
        return Batch(tuple(cols), b.sel, b.count)

    return node.schema, _node_jit(node, "window", kern)(batch)


def _exec_union(node: L.Union, ctx):
    ls, lb = execute(node.left, ctx)
    rs, rb = execute(node.right, ctx)
    return node.schema, _concat_batches(node, [lb, rb])


_EXEC = {
    L.Get: _exec_get,
    L.Filter: _exec_filter,
    L.Project: _exec_project,
    L.Aggregate: _exec_aggregate,
    L.Join: _exec_join,
    L.CrossProduct: _exec_cross,
    L.Order: _exec_order,
    L.Window: _exec_window,
    L.Limit: _exec_limit,
    L.Distinct: _exec_distinct,
    L.Union: _exec_union,
}
