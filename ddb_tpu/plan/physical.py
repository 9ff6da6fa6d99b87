"""Physical execution of bound logical plans — whole-pipeline fusion.

The TPU analog of the reference's PhysicalOperator/Pipeline/PipelineExecutor
stack (reference: src/execution/physical_operator.hpp:36,
src/parallel/pipeline.hpp:72, parallel/pipeline_executor.cpp).  Differences
by design:

* **Pipeline compiler.**  Operators append deferred transformations to a
  `Lazy` fusion DAG instead of launching kernels; every chain between
  pipeline *breakers* is traced and jit-compiled as ONE XLA program, so
  XLA fuses scan+filter+project+aggregate chains end-to-end (the reference
  fuses by looping streaming operators over DataChunks inside one task —
  reference: pipeline_executor.cpp:186-280).  Breakers are exactly the
  points that need a host-side cardinality decision: join output capacity,
  UNION packing, cross products.  A breaker costs one device→host fetch of
  a small stats vector (all scalars batched into a single transfer).
* Dynamic cardinalities (join fan-out, group counts, post-filter
  compaction) are decided on host at breakers with power-of-two capacity
  bucketing — the TPU answer to HAVE_MORE_OUTPUT / chunked
  ScanStructure::Next probing (reference: physical_hash_join.cpp:973-1045).
* Aggregation picks a perfect-hash path (dense small key domain — analog
  of reference's PerfectHashAggregate, perfect_aggregate_hashtable.cpp)
  or the general sort/segment path (ops/aggregate.py).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple, Union

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
from . import bounds as B
from . import logical as L


class ExecutionContext:
    """Per-query execution state (profiling + progress hooks land here)."""

    def __init__(self, profiler=None, progress=None):
        self.profiler = profiler
        self.progress = progress       # callable(done_nodes, total_nodes)
        self._total_nodes = 0
        self._done_nodes = 0
        # per-query results of shared Materialize nodes (CTE reuse)
        self.memo = {}

    def _report(self):
        if self.progress is not None and self._total_nodes:
            self.progress(self._done_nodes, self._total_nodes)


# ---------------------------------------------------------------------------
# fusion DAG
# ---------------------------------------------------------------------------

class Lazy:
    """Deferred device computation — one node of a per-query fusion DAG.

    The pipeline-compiler analog of the reference's Pipeline (source →
    streaming operators → sink, reference: parallel/pipeline.hpp:72):
    forcing a Lazy compiles its reachable DAG into a single jitted XLA
    program.  `key` is a structural cache key (stable across executions of
    the same prepared plan — plan objects are reused by the plan cache), so
    repeated queries hit both the composed-function cache and jax's own
    trace cache.  `fn` closures must only capture plan-node metadata, never
    device arrays (same discipline as the per-node jit caches before)."""

    __slots__ = ("key", "fn", "deps")

    def __init__(self, key, fn, deps):
        self.key = key
        self.fn = fn
        self.deps = tuple(deps)


def _lazy(node, key, fn, *deps) -> Lazy:
    k = (id(node),) + (key if isinstance(key, tuple) else (key,))
    return Lazy(k, fn, deps)


def _node_jit(node, key, fn, static_argnums=()):
    """One jax.jit per (plan node, kernel); jit itself caches on shapes."""
    cache = getattr(node, "_kern_cache", None)
    if cache is None:
        cache = {}
        setattr(node, "_kern_cache", cache)
    if key not in cache:
        cache[key] = jax.jit(fn, static_argnums=static_argnums)
    return cache[key]


def _force(trigger, items):
    """Compile + run the fused stage producing every item in `items`.

    Concrete (non-Lazy) items pass through.  The composed function is
    cached on `trigger` keyed by DAG structure; since all constituent plan
    nodes are alive in trigger's subtree, their ids are stable keys."""
    if not any(isinstance(x, Lazy) for x in items):
        return list(items)

    order: List[Lazy] = []
    seen = set()

    def visit(x: Lazy):
        if id(x) in seen:
            return
        seen.add(id(x))
        for d in x.deps:
            if isinstance(d, Lazy):
                visit(d)
        order.append(x)

    for x in items:
        if isinstance(x, Lazy):
            visit(x)

    node_pos = {id(nd): i for i, nd in enumerate(order)}
    leaf_ids = {}
    leaves = []

    def leaf(d):
        if id(d) not in leaf_ids:
            leaf_ids[id(d)] = len(leaves)
            leaves.append(d)
        return leaf_ids[id(d)]

    struct = []
    for nd in order:
        spec = tuple(("n", node_pos[id(d)]) if isinstance(d, Lazy)
                     else ("l", leaf(d)) for d in nd.deps)
        struct.append((nd.key, spec))
    out_spec = tuple(("n", node_pos[id(x)]) if isinstance(x, Lazy)
                     else ("l", leaf(x)) for x in items)
    stage_key = ("stage", tuple(struct), out_spec)

    def composed(*leaf_vals):
        env = [None] * len(order)
        for i, nd in enumerate(order):
            args = [env[node_pos[id(d)]] if isinstance(d, Lazy)
                    else leaf_vals[leaf_ids[id(d)]] for d in nd.deps]
            env[i] = nd.fn(*args)
        return tuple(env[p] if k == "n" else leaf_vals[p]
                     for k, p in out_spec)

    fn = _node_jit(trigger, stage_key, composed)
    return list(fn(*leaves))


def _concrete(node, b):
    return _force(node, [b])[0] if isinstance(b, Lazy) else b


def _stack_counts(*batches):
    return jnp.stack([b.count.astype(jnp.int32) for b in batches])


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

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
        if c.hi is not None:
            carried.append(c.hi)
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
        h = None
        if c.hi is not None:
            h = rest[i][:new_cap]
            i += 1
        cols.append(Column(d, n, h))
    return Batch(tuple(cols), sel, batch.count)


def _compact_lazy(node, b, n: int, tag="compact",
                  always=False) -> Union[Batch, Lazy]:
    """Queue a capacity shrink when live rows don't fill the batch.
    `always` forces the live-rows-to-front move even when the capacity
    doesn't shrink (needed before static `[:n]` packing slices).  Only
    callable where n (live count) is host-known, i.e. after a breaker's
    stats fetch."""
    cap = b.sel.shape[0] if isinstance(b, Batch) else None
    if cap is None:
        raise AssertionError("compact needs a concrete batch")
    want = min(bucket_capacity(max(n, 1)), cap)
    if want < cap or always:
        return _lazy(node, (tag, want),
                     functools.partial(_compact, new_cap=want), b)
    return b


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

def _count_nodes(node: L.LogicalNode) -> int:
    return 1 + sum(_count_nodes(c) for c in node.children())


def execute(node: L.LogicalNode, ctx: Optional[ExecutionContext] = None
            ) -> Tuple[Schema, Batch]:
    ctx = ctx or ExecutionContext()
    if ctx.progress is not None:
        ctx._total_nodes = _count_nodes(node)
        ctx._done_nodes = 0
    schema, b = _execute(node, ctx)
    b = _concrete(node, b)
    if ctx.progress is not None:
        ctx._done_nodes = ctx._total_nodes
        ctx._report()
    return schema, b


def _execute(node: L.LogicalNode, ctx) -> Tuple[Schema, Union[Batch, Lazy]]:
    fn = _EXEC[type(node)]
    if ctx.progress is not None:
        schema, b = fn(node, ctx)
        ctx._done_nodes += 1
        ctx._report()
        return schema, b
    if ctx.profiler is not None:
        # profiled runs break fusion per operator so per-op timing and
        # cardinality stay meaningful (same trade as the reference's
        # profiler, main/query_profiler.hpp)
        with ctx.profiler.operator(type(node).__name__, node):
            schema, b = fn(node, ctx)
            b = _concrete(node, b)
            ctx.profiler.record_cardinality(node, b)
        return schema, b
    return fn(node, ctx)


def _index_scan_rows(node: L.Get):
    """Row ids from a point-lookup index when the scan filters pin an
    index's key columns with constants AND the match is selective —
    the TPU analog of the reference's index-scan plan choice
    (table_scan.cpp TryScanIndex).  Returns None to use the full scan."""
    td = node.table
    if not getattr(td, "indexes", None) or not node.filters:
        return None
    eqs, los, his = {}, {}, {}
    indexed_cols = {c.lower() for ix in td.indexes.values()
                    for c in ix.columns}
    dummy = Batch((), jnp.ones(1, dtype=bool), jnp.int32(1))
    for f in node.filters:
        if not (isinstance(f, ir.Cmp) and isinstance(f.left, ir.ColRef)
                and not ir.referenced_columns(f.right)):
            continue
        try:
            col = td.columns[node.column_indices[f.left.index]]
        except (IndexError, TypeError):
            return None
        cname = col.name.lower()
        if cname not in indexed_cols:
            continue
        try:
            d, nmask = evaluate(f.right, dummy)
            if nmask is not None and bool(np.asarray(nmask)[0]):
                continue
            v = np.asarray(d)[0].astype(col.data.dtype)
        except Exception:
            continue
        if f.op == "==":
            eqs[cname] = v
        elif f.op in ("<", "<="):
            his[cname] = (v, f.op == "<")
        elif f.op in (">", ">="):
            los[cname] = (v, f.op == ">")
    for ix in td.indexes.values():
        cols = [c.lower() for c in ix.columns]
        rows = None
        if cols and all(c in eqs for c in cols):
            rows = ix.lookup_eq(td, [eqs[c] for c in cols])
        elif len(cols) == 1 and (cols[0] in los or cols[0] in his):
            lo = los.get(cols[0])
            hi = his.get(cols[0])
            rows = ix.lookup_range(
                td, lo[0] if lo else None, hi[0] if hi else None,
                lo_strict=bool(lo and lo[1]),
                hi_strict=bool(hi and hi[1]))
        if rows is None:
            continue
        # selective enough to beat the full-column device pass?
        if len(rows) * 4 <= td.num_rows or len(rows) <= 4096:
            return np.sort(rows)
    return None


def _zone_map_groups(node: L.Get):
    """Row-group zone-map pruning for a filtered scan (reference:
    per-segment CheckZonemap, src/storage/table/column_segment.cpp +
    row_group.hpp:70).  Returns the list of surviving group ids when at
    least one group is provably filter-free, else None (whole-table
    scan).  Exactness is preserved because the residual filter mask
    still applies to the surviving rows."""
    from ..storage import table as table_mod
    from . import bounds as PB

    if not node.filters:
        return None
    tbl = node.table
    n = tbl.num_rows
    if n <= table_mod.ROW_GROUP_SIZE:
        return None
    try:
        stats = tbl.row_group_stats()
        pred = ir.make_and(node.filters)
        keep = []
        for g, row in enumerate(stats):
            cols = []
            nullable = []
            for i in (node.column_indices
                      if node.column_indices is not None
                      else range(len(tbl.columns))):
                mn, mx, hn = row[i]
                if mn is None:
                    cols.append(None)
                else:
                    try:
                        cols.append((float(mn), float(mx)))
                    except (TypeError, ValueError):
                        cols.append(None)
                nullable.append(hn)
            if PB.pred_maybe_true(pred, cols, nullable):
                keep.append(g)
        table_mod.SCAN_STATS["groups_total"] += len(stats)
        table_mod.SCAN_STATS["groups_skipped"] += len(stats) - len(keep)
        if len(keep) == len(stats):
            return None
        return keep
    except Exception:
        return None


def _exec_get(node: L.Get, ctx):
    rows = _index_scan_rows(node)
    if rows is not None:
        # filters still apply below: the index pre-selects, the residual
        # mask keeps exactness (other conjuncts, boundary semantics)
        batch = node.table.device_batch_rows(node.column_indices, rows)
    else:
        batch = None
        gids = _zone_map_groups(node)
        if gids is not None:
            batch = node.table.device_batch_groups(node.column_indices,
                                                   gids)
        if batch is None:
            batch = node.table.device_batch(node.column_indices)
    if node.filters:
        pred = ir.make_and(node.filters)

        def kern(b):
            m = select_mask(pred, b)
            return Batch(b.columns, m, m.astype(jnp.int32).sum())

        return node.schema, _lazy(node, "scan_filter", kern, batch)
    return node.schema, batch


def _exec_filter(node: L.Filter, ctx):
    schema, batch = _execute(node.child, ctx)

    def kern(b):
        m = select_mask(node.predicate, b)
        return Batch(b.columns, m, m.astype(jnp.int32).sum())

    return node.schema, _lazy(node, "filter", kern, batch)


def _exec_project(node: L.Project, ctx):
    schema, batch = _execute(node.child, ctx)

    def kern(b):
        cols = []
        for e in node.exprs:
            # bare column refs pass through unchanged, preserving wide
            # (two-limb) columns exactly
            if isinstance(e, ir.ColRef):
                cols.append(b.columns[e.index])
                continue
            d, n = evaluate(e, b)
            cols.append(Column(d, n))
        return Batch(tuple(cols), b.sel, b.count)

    return node.schema, _lazy(node, "project", kern, batch)


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


def _wide_aggs(node: L.Aggregate, capacity: int):
    """Indices of sum/avg aggregates that need two-limb (i128) accumulation:
    int/decimal argument whose int64 sum cannot be proven overflow-free by
    interval analysis (plan/bounds.py) for this batch capacity."""
    wide = set()
    child_bounds = None
    for i, a in enumerate(node.aggs):
        if a.kind not in ("sum", "avg") or a.arg is None:
            continue
        at = a.arg.dtype
        if not (at.is_integer or at.id == TypeId.DECIMAL):
            continue
        if child_bounds is None:
            try:
                child_bounds = B.node_bounds(node.child)
            except Exception:
                child_bounds = [None] * len(node.child.schema)
        bd = B.expr_bounds(a.arg, child_bounds)
        if not B.sum_fits_int64(bd, capacity):
            wide.add(i)
    return wide


def _payloads(node: L.Aggregate, b: Batch, wide=frozenset()):
    ps = []
    for i, a in enumerate(node.aggs):
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
        elif kind in ("sum", "avg") and i in wide:
            kind = {"sum": "sum_wide", "avg": "avg_wide"}[kind]
        ps.append(agg_ops.AggPayload(kind, d, n, d2))
    return ps


def _agg_output(node: L.Aggregate, group_cols, agg_results, gsel, ngroups,
                gcap):
    cols = []
    for (d, n) in group_cols:
        cols.append(Column(d, n))
    for a, (d, n) in zip(node.aggs, agg_results):
        if isinstance(d, tuple):          # wide sum: (composed, high limb)
            cols.append(Column(d[0], n, d[1]))
            continue
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
    if any(a.kind in _HOST_AGG_KINDS for a in node.aggs):
        return _exec_aggregate_host(node, ctx)
    schema, batch = _execute(node.child, ctx)

    if not node.groups:
        def kern(b):
            ps = _payloads(node, b, _wide_aggs(node, b.sel.shape[0]))
            res = []
            for spec, p in zip(node.aggs, ps):
                if spec.kind == "quantile":
                    vops = sortkey.encode_key(p.data, p.nulls,
                                              spec.arg.dtype)
                    res.append(agg_ops.ungrouped_quantile(
                        vops, p, spec.quantile, b.sel, spec.interpolate))
                elif spec.kind == "mode":
                    vops = sortkey.encode_key(p.data, p.nulls,
                                              spec.arg.dtype)
                    res.append(agg_ops.ungrouped_mode(vops, p, b.sel))
                elif spec.kind == "entropy":
                    vops = sortkey.encode_key(p.data, p.nulls,
                                              spec.arg.dtype)
                    res.append(agg_ops.ungrouped_entropy(vops, p, b.sel))
                elif spec.kind in ("arg_min", "arg_max"):
                    bd, bn = evaluate(spec.arg2, b)
                    bops = sortkey.encode_key(bd, bn, spec.arg2.dtype)
                    res.append(agg_ops.ungrouped_argext(
                        bops, bn, p, b.sel, spec.kind == "arg_max",
                        keep_null_payload=(getattr(spec, "extra", None)
                                           == "keep_null_payload")))
                elif spec.kind == "approx_count_distinct":
                    vops = sortkey.encode_key(p.data, p.nulls,
                                              spec.arg.dtype)
                    if b.sel.shape[0] >= (1 << 17):
                        # HyperLogLog above the exactness threshold
                        # (ops/sketch.py; reference: approx_count.cpp)
                        from ..ops import sketch
                        est = sketch.hll_count_distinct(
                            vops[0], b.sel, p.nulls)
                        res.append((est, None))
                    else:
                        cp = agg_ops.AggPayload("count", p.data,
                                                p.nulls)
                        res.append(agg_ops.ungrouped_distinct(
                            vops, cp, b.sel))
                elif spec.distinct and spec.kind != "count_star":
                    vops = sortkey.encode_key(p.data, p.nulls,
                                              spec.arg.dtype)
                    res.append(agg_ops.ungrouped_distinct(vops, p, b.sel))
                else:
                    res.append(agg_ops.ungrouped_aggregate([p], b.sel)[0])
            cols = []
            for a, (v, isn) in zip(node.aggs, res):
                n = None
                if isn is not None:
                    n = jnp.zeros(128, dtype=bool).at[0].set(isn)
                if isinstance(v, tuple):   # wide sum (composed, hi limb)
                    d = jnp.zeros(128, jnp.int64).at[0].set(v[0])
                    h = jnp.zeros(128, jnp.int64).at[0].set(v[1])
                    cols.append(Column(d, n, h))
                    continue
                if (a.kind == "avg"
                        or (a.kind == "quantile" and a.interpolate)) \
                        and a.arg is not None \
                        and a.arg.dtype.id == TypeId.DECIMAL:
                    v = v / T.decimal_scale_factor(a.arg.dtype.scale)
                want = np.dtype(a.dtype.np_dtype)
                d = jnp.zeros(128, dtype=want).at[0].set(v.astype(want))
                cols.append(Column(d, n))
            sel = jnp.zeros(128, dtype=bool).at[0].set(True)
            return Batch(tuple(cols), sel, jnp.int32(1))

        return node.schema, _lazy(node, "ungrouped", kern, batch)

    has_distinct = any(a.distinct and a.kind != "count_star"
                       for a in node.aggs)
    _dense_kinds = {"count_star", "count", "sum", "sum_float", "avg",
                    "sum_wide", "avg_wide", "min", "max", "any_value",
                    "var_samp", "var_pop", "stddev_samp", "stddev_pop",
                    "covar_samp", "covar_pop", "corr"}
    dense_ok = all(a.kind in _dense_kinds for a in node.aggs)
    sizes = None if (has_distinct or not dense_ok) \
        else _perfect_hash_domain(node)
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
            ps = _payloads(node, b, _wide_aggs(node, b.sel.shape[0]))
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

        # output capacity = dense domain: already small and static
        return node.schema, _lazy(node, "perfect_agg", kern, batch)

    # general sort-based path
    def kern(b):
        return local_grouped_aggregate(node, b)

    return node.schema, _lazy(node, "sort_agg", kern, batch)


def local_grouped_aggregate(node: L.Aggregate, b: Batch) -> Batch:
    """Sort-based grouped aggregation of one batch — pure lax ops, so
    the distributed executor reuses it inside shard_map after a
    row-level exchange (special aggregates: DISTINCT/quantile/mode/
    arg_min/arg_max/entropy need full rows co-located per group)."""
    key_ops, key_data = [], []
    for g in node.groups:
        d, n = evaluate(g, b)
        key_ops.extend(sortkey.encode_key(d, n, g.dtype))
        key_data.append((d, n))
    ps = _payloads(node, b, _wide_aggs(node, b.sel.shape[0]))
    gcap = b.sel.shape[0]

    def is_special(a):
        return a.kind in ("quantile", "mode", "arg_min", "arg_max",
                          "entropy", "approx_count_distinct") \
            or (a.distinct and a.kind != "count_star")

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
        elif a.kind == "mode":
            vops = sortkey.encode_key(p.data, p.nulls, a.arg.dtype)
            results[i] = agg_ops.group_mode(
                key_ops, vops, p, b.sel, gcap)
        elif a.kind == "entropy":
            vops = sortkey.encode_key(p.data, p.nulls, a.arg.dtype)
            results[i] = agg_ops.group_entropy(
                key_ops, vops, p, b.sel, gcap)
        elif a.kind in ("arg_min", "arg_max"):
            bd, bn = evaluate(a.arg2, b)
            bops = sortkey.encode_key(bd, bn, a.arg2.dtype)
            results[i] = agg_ops.group_argext(
                key_ops, bops, bn, p, b.sel, gcap,
                a.kind == "arg_max",
                keep_null_payload=(getattr(a, "extra", None)
                                   == "keep_null_payload"))
        elif a.kind == "approx_count_distinct" \
                or (a.distinct and a.kind != "count_star"):
            cp = agg_ops.AggPayload("count", p.data, p.nulls) \
                if a.kind == "approx_count_distinct" else p
            vops = sortkey.encode_key(p.data, p.nulls, a.arg.dtype)
            results[i] = agg_ops.group_distinct_aggregate(
                key_ops, vops, cp, b.sel, gcap)
    return _agg_output(node, group_cols, results, gsel, ng, gcap)




# ---- unnest (host expansion) ------------------------------------------------

def _exec_unnest(node: "L.Unnest", ctx):
    """Expand a LIST column into rows (reference: physical_unnest.cpp).
    List payloads live host-side by design (no var-len device repr), so
    unnest materializes the child and re-uploads the expanded batch."""
    from ..storage.strings import StringDictionary
    cschema, lazy = _execute(node.child, ctx)
    b = _concrete(node.child, lazy)
    sel = np.asarray(b.sel).astype(bool)
    datas = []
    for c in b.columns:
        d = np.asarray(c.data)[sel]
        n = np.asarray(c.nulls)[sel] if c.nulls is not None else None
        datas.append((d, n))
    store = cschema.fields[node.index].strdict
    ids, idn = datas[node.index]
    nlists = len(store)
    lens = store.lengths() if nlists else np.zeros(0, np.int64)
    reps = np.zeros(len(ids), dtype=np.int64)
    valid = (ids >= 0) & (ids < nlists)
    if idn is not None:
        valid &= ~idn
    reps[valid] = lens[ids[valid].astype(np.int64)]
    total = int(reps.sum())
    elems = []
    for i in np.nonzero(reps)[0]:
        elems.extend(store.items[int(ids[i])])
    et = node.schema.fields[node.index].dtype
    if et.id == TypeId.VARCHAR:
        sd = node.schema.fields[node.index].strdict
        newd, codes, en = StringDictionary.encode(elems)
        sd.values = newd.values
        sd._lookup = None
        ed, enul = codes, (en if en.any() else None)
    else:
        enul = np.array([v is None for v in elems], dtype=bool)
        ed = np.array([T.encode_literal(v, et) if v is not None else 0
                       for v in elems], dtype=et.np_dtype)
        enul = enul if enul.any() else None
    arrays, nulls = [], []
    for j, (d, n) in enumerate(datas):
        if j == node.index:
            arrays.append(ed)
            nulls.append(enul)
        else:
            arrays.append(np.repeat(d, reps))
            nulls.append(np.repeat(n, reps) if n is not None else None)
    if total == 0:
        arrays = [np.zeros(0, dtype=a.dtype) for a in arrays]
        nulls = [None] * len(arrays)
    return node.schema, make_batch(arrays, nulls, total)


# ---- host aggregation for var-size results (list / string_agg) -------------

_HOST_AGG_KINDS = ("collect", "string_agg", "histogram",
                   "approx_top_k", "mad", "udaf")


def _string_agg_vectorized(a, ds, ns, starts, ends, ngroups, aorder,
                           nrows):
    """Vectorized string_agg finalize: decode every value once, build
    ONE global joined string with separators, then slice per group by
    cumulative character offsets — host work is bounded to final string
    slicing, no per-group Python value loop (reference: vectorized
    nested aggregates, extension/core_functions/aggregate/nested/).
    Returns (res, rn) or None when the shape needs the generic loop."""
    if a.kind != "string_agg" or a.distinct or aorder is not None \
            or nrows == 0:
        return None
    sd = getattr(a.arg, "strdict", None)
    tid = a.arg.dtype.id
    if sd is not None:
        vals = np.asarray(sd.values, dtype=object)[ds].astype(str)
    elif a.arg.dtype.is_integer:
        vals = ds.astype(np.int64).astype(str)
    elif tid == TypeId.DATE:
        vals = ds.astype("datetime64[D]").astype(str)
    elif tid == TypeId.BOOLEAN:
        vals = np.where(ds.astype(bool), "True", "False")
    else:
        return None        # floats/decimals: repr fidelity via the loop
    sep = a.extra
    live = ~ns if ns is not None else np.ones(nrows, dtype=bool)
    gid = np.zeros(nrows, dtype=np.int64)
    gid[starts[1:]] = 1
    gid = np.cumsum(gid)
    sv = vals[live]
    g2 = gid[live]
    res = [""] * ngroups
    rn = [True] * ngroups
    if len(sv) == 0:
        return res, rn
    is_first = np.ones(len(sv), dtype=bool)
    is_first[1:] = g2[1:] != g2[:-1]
    lens = np.char.str_len(sv)
    parts = np.where(is_first, sv, np.char.add(sep, sv))
    big = "".join(parts.tolist())
    plens = lens + np.where(is_first, 0, len(sep))
    cend = np.cumsum(plens)
    first_idx = np.nonzero(is_first)[0]
    cstart = cend[first_idx] - plens[first_idx]
    last = np.append(first_idx[1:] - 1, len(sv) - 1)
    gids = g2[first_idx]
    for j in range(len(first_idx)):
        res[gids[j]] = big[cstart[j]:cend[last[j]]]
        rn[gids[j]] = False
    return res, rn


def _decode_host(vals, nulls, dtype, sd):
    out = []
    for i, v in enumerate(vals):
        if nulls is not None and nulls[i]:
            out.append(None)
        elif sd is not None:
            out.append(sd.decode_one(int(v)))
        else:
            out.append(T.decode_value(v, dtype))
    return out


def _exec_aggregate_host(node: L.Aggregate, ctx):
    """Aggregation with variable-size results (list()/string_agg) runs on
    host: sorted groupby over fetched arrays, python-list payloads into
    the specs' stores (reference: nested aggregates in
    extension/core_functions/aggregate/nested/list.cpp)."""
    from ..storage.strings import StringDictionary
    cschema, lazy = _execute(node.child, ctx)
    b = _concrete(node.child, lazy)
    sel = np.asarray(b.sel).astype(bool)

    def fetch(pair):
        d, n = pair
        return (np.asarray(d)[sel],
                np.asarray(n)[sel] if n is not None else None)

    G = [fetch(evaluate(g, b)) for g in node.groups]
    AV = []
    for a in node.aggs:
        if a.arg is None:
            AV.append((None, None))
        else:
            AV.append(fetch(evaluate(a.arg, b)))
    nrows = int(sel.sum())

    if node.groups:
        seq = []
        for (d, n) in reversed(G):
            seq.append(d)
            seq.append(n if n is not None
                       else np.zeros(len(d), dtype=bool))
        order = np.lexsort(tuple(seq))
        bounds = np.zeros(nrows, dtype=bool)
        if nrows:
            bounds[0] = True
            for (d, n) in G:
                ds = d[order]
                bounds[1:] |= ds[1:] != ds[:-1]
                if n is not None:
                    ns = n[order]
                    bounds[1:] |= ns[1:] != ns[:-1]
        starts = np.nonzero(bounds)[0]
        ends = np.append(starts[1:], nrows)
    else:
        order = np.arange(nrows)
        starts = np.array([0])
        ends = np.array([nrows])
    ngroups = len(starts)

    arrays, nulls_out = [], []
    for (d, n) in G:
        arrays.append(d[order][starts])
        nulls_out.append(n[order][starts] if n is not None else None)

    for a, (d, n) in zip(node.aggs, AV):
        ds = d[order] if d is not None else None
        ns = n[order] if n is not None else None
        aorder = None
        if getattr(a, "order_by", None):
            # agg(x ORDER BY ...): per-group reorder by the modifier's
            # keys (reference: ORDER_MODIFIER on bound aggregate
            # expressions, bound_aggregate_expression.hpp)
            seq = []
            for (oe, desc, nl) in reversed(a.order_by):
                kd, kn = fetch(evaluate(oe, b))
                kd = kd[order]
                kn = kn[order] if kn is not None \
                    else np.zeros(len(kd), dtype=bool)
                if kd.dtype == bool:
                    kd = kd.astype(np.int8)
                seq.append(-kd if desc else kd)
                seq.append(kn.astype(np.int8) if nl
                           else (~kn).astype(np.int8))
            aorder = seq
        fast = _string_agg_vectorized(a, ds, ns, starts, ends,
                                      ngroups, aorder, nrows)
        if fast is not None:
            res, rn = fast
        else:
            res, rn = [], []
        for s, e in (() if fast is not None else zip(starts, ends)):
            if a.kind == "count_star":
                res.append(e - s)
                rn.append(False)
                continue
            if aorder is not None and e > s:
                loc = np.lexsort(tuple(k[s:e] for k in aorder))
                dd = ds[s:e][loc]
                live = ~ns[s:e][loc] if ns is not None \
                    else np.ones(e - s, dtype=bool)
                dd = dd[live]
                if a.kind == "count":
                    res.append(len(dd))
                    rn.append(False)
                    continue
                if a.kind in ("collect", "string_agg"):
                    sd = getattr(a.arg, "strdict", None)
                    vals = _decode_host(dd, None, a.arg.dtype, sd)
                    if a.distinct:
                        seen, uniq = set(), []
                        for v in vals:
                            if v not in seen:
                                seen.add(v)
                                uniq.append(v)
                        vals = uniq
                    if a.kind == "collect":
                        res.append(vals)
                        rn.append(False)
                    else:
                        res.append(a.extra.join(str(v) for v in vals))
                        rn.append(len(vals) == 0)
                    continue
            dd = ds[s:e]
            live = ~ns[s:e] if ns is not None else np.ones(e - s,
                                                           dtype=bool)
            dd = dd[live]
            if a.kind == "count":
                res.append(len(dd))
                rn.append(False)
                continue
            if a.kind in ("collect", "string_agg", "histogram",
                          "approx_top_k"):
                sd = getattr(a.arg, "strdict", None)
                vals = _decode_host(dd, None, a.arg.dtype, sd)
                if a.kind == "histogram":
                    # MAP<value, count>, keys ascending (reference:
                    # core_functions/aggregate/holistic/histogram.cpp)
                    from collections import Counter
                    extra = getattr(a, "extra", None)
                    if isinstance(extra, tuple) and extra[0] in (
                            "bins", "exact"):
                        mode_, bounds = extra
                        if mode_ == "exact":
                            c = Counter(v for v in vals
                                        if v in set(bounds))
                            res.append([(b, c.get(b, 0))
                                        for b in bounds])
                        else:
                            sb = sorted(bounds)
                            counts = {b: 0 for b in sb}
                            over = 0
                            for v in vals:
                                for b in sb:
                                    if v <= b:
                                        counts[b] += 1
                                        break
                                else:
                                    over += 1
                            items = [(b, counts[b]) for b in sb]
                            if over:
                                items.append((2**63 - 1, over))
                            res.append(items)
                        rn.append(False)
                        continue
                    c = Counter(vals)
                    res.append(sorted(c.items()))
                    rn.append(len(c) == 0)
                    continue
                if a.kind == "approx_top_k":
                    from collections import Counter
                    c = Counter(vals)
                    top = sorted(c.items(), key=lambda kv: (-kv[1],))
                    res.append([k for k, _n in top[:a.extra]])
                    rn.append(len(c) == 0)
                    continue
                if a.distinct:
                    seen, uniq = set(), []
                    for v in vals:
                        if v not in seen:
                            seen.add(v)
                            uniq.append(v)
                    vals = uniq
                if a.kind == "collect":
                    res.append(vals)
                    rn.append(False)
                else:
                    res.append(a.extra.join(str(v) for v in vals))
                    rn.append(len(vals) == 0)
                continue
            if a.kind == "udaf":
                # user aggregate: row-wise init/update/finalize
                # callbacks over decoded Python values (reference:
                # duckdb_create_aggregate_function,
                # src/main/capi/aggregate_function-c.cpp)
                init, update, finalize = a.extra
                sd2 = getattr(a.arg, "strdict", None)
                vals = _decode_host(dd, None, a.arg.dtype, sd2)
                if a.distinct:
                    seen, uniq = set(), []
                    for v in vals:
                        if v not in seen:
                            seen.add(v)
                            uniq.append(v)
                    vals = uniq
                st = init()
                for v in vals:
                    update(st, v)
                r = finalize(st)
                res.append(r)
                rn.append(r is None)
                continue
            if len(dd) == 0:
                res.append(0)
                rn.append(True)
                continue
            rn.append(False)
            if a.kind in ("sum", "sum_float"):
                res.append(dd.sum())
            elif a.kind == "avg":
                res.append(float(dd.astype(np.float64).mean()))
            elif a.kind == "min":
                res.append(dd.min())
            elif a.kind == "max":
                res.append(dd.max())
            elif a.kind == "any_value":
                res.append(dd[0])
            elif a.kind == "mad":
                # median absolute deviation (reference:
                # core_functions/aggregate/holistic/mad.cpp)
                med = np.median(dd.astype(np.float64))
                res.append(float(np.median(
                    np.abs(dd.astype(np.float64) - med))))
            else:
                raise NotImplementedError(
                    f"{a.kind} cannot combine with list aggregates yet")
        if a.kind in ("collect", "approx_top_k"):
            a.store.replace_all([r if not isnull else []
                                 for r, isnull in zip(res, rn)])
            arrays.append(np.arange(ngroups, dtype=np.int32))
            nulls_out.append(np.array(rn) if any(rn) else None)
        elif a.kind == "histogram":
            for r, isnull in zip(res, rn):
                a.store.add(r if not isnull else [])
            arrays.append(np.arange(ngroups, dtype=np.int32))
            nulls_out.append(np.array(rn) if any(rn) else None)
        elif a.kind == "string_agg":
            newd, codes, _ = StringDictionary.encode(
                [r if not isnull else "" for r, isnull in zip(res, rn)])
            a.store.values = newd.values
            a.store._lookup = None
            arrays.append(codes)
            nulls_out.append(np.array(rn) if any(rn) else None)
        elif a.kind == "udaf":
            if a.dtype.id == TypeId.VARCHAR:
                newd, codes, _ = StringDictionary.encode(
                    ["" if isnull else str(r)
                     for r, isnull in zip(res, rn)])
                a.store.values = newd.values
                a.store._lookup = None
                arrays.append(codes)
            else:
                want = np.dtype(a.dtype.np_dtype)
                vals2 = [0 if isnull else r
                         for r, isnull in zip(res, rn)]
                if a.dtype.id == TypeId.DECIMAL:
                    vals2 = [int(round(float(v)
                                       * 10 ** a.dtype.scale))
                             for v in vals2]
                arrays.append(np.array(vals2).astype(want))
            nulls_out.append(np.array(rn) if any(rn) else None)
        elif a.kind == "avg":
            arrays.append(np.array(res, dtype=np.float64))
            nulls_out.append(np.array(rn) if any(rn) else None)
        else:
            want = np.dtype(a.dtype.np_dtype)
            arrays.append(np.array(res).astype(want))
            nulls_out.append(np.array(rn) if any(rn) else None)

    return node.schema, make_batch(arrays, nulls_out, ngroups)


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


def _mark_nulls(node: L.Join, lb: Batch, rb: Batch, has):
    """NULL mask for a 3-valued IN mark column (node.mark_in).

    mark is NULL where no match AND (a correlation-matching build row has
    a NULL IN-value, OR the probe IN-value is NULL and some build row
    matches the correlation keys).  Uncorrelated joins reduce both
    conditions to scalars (build-has-null / build-nonempty).
    Reference: ScanStructure::NextMarkJoin, join_hashtable.cpp."""
    _, lnull = evaluate(node.conds[0].left, lb)
    _, rnull = evaluate(node.conds[0].right, rb)
    cap_l = lb.sel.shape[0]
    probe_null = lnull if lnull is not None \
        else jnp.zeros(cap_l, dtype=bool)
    build_live = rb.sel
    corr = node.conds[1:]
    if not corr:
        nonempty = jnp.any(build_live)
        if rnull is not None:
            hasnull = jnp.any(build_live & rnull)
        else:
            hasnull = jnp.zeros((), dtype=bool)
        return ~has & ((probe_null & nonempty) | hasnull)
    # correlated: does any build row match the correlation keys at all
    # (n_any), and does one of those carry a NULL IN-value (n_null)?
    lds, lns = _key_arrays(corr, lb, "left")
    rds, rns = _key_arrays(corr, rb, "right")
    l_live = _combine_live(lb.sel, lns)
    r_live = _combine_live(build_live, rns)
    if len(lds) == 1:
        lk, rk = lds[0], rds[0]
    else:
        lk, rk = _densify_keys(lds, l_live, rds, r_live)
        l_live = l_live & (lk >= 0)
        r_live = r_live & (rk >= 0)
    bt_any = join_ops.build(rk, None, r_live)
    _, cnt_any = join_ops.probe_ranges(bt_any, lk, None, l_live)
    n_any = cnt_any > 0
    if rnull is not None:
        r_live_null = r_live & rnull
        bt_n = join_ops.build(rk, None, r_live_null)
        _, cnt_n = join_ops.probe_ranges(bt_n, lk, None, l_live)
        n_null = cnt_n > 0
    else:
        n_null = jnp.zeros(cap_l, dtype=bool)
    return ~has & (n_null | (probe_null & n_any))


def _exec_nl_outer(node: L.Join, ctx):
    """Nested-loop OUTER join with an arbitrary predicate and no equi/
    range keys (reference: physical_nested_loop_join.cpp outer paths):
    all pairs are materialized, the predicate selects matches, and
    unmatched preserved-side rows append NULL-padded."""
    ls, lbz = _execute(node.left, ctx)
    rs, rbz = _execute(node.right, ctx)
    jt = node.join_type
    statsz = _lazy(node, "stats",
                   lambda lb, rb: _stack_counts(lb, rb), lbz, rbz)
    lb, rb, st = _force(node, [lbz, rbz, statsz])
    nl_live, nr_live = (int(x) for x in np.asarray(st))
    lb = _concrete(node, _compact_lazy(node, lb, nl_live, tag="lcomp"))
    rb = _concrete(node, _compact_lazy(node, rb, nr_live, tag="rcomp"))
    nl, nr = lb.sel.shape[0], rb.sel.shape[0]
    extra_l = nl if jt in ("left", "full") else 0
    extra_r = nr if jt in ("right", "full") else 0
    cap = bucket_capacity(nl * nr + extra_l + extra_r)

    def kern(lb, rb):
        li = lax.broadcasted_iota(jnp.int32, (nl, nr), 0).reshape(-1)
        ri = lax.broadcasted_iota(jnp.int32, (nl, nr), 1).reshape(-1)
        pcols = []
        for c in lb.columns:
            pcols.append(Column(c.data[li],
                                c.nulls[li] if c.nulls is not None
                                else None))
        for c in rb.columns:
            pcols.append(Column(c.data[ri],
                                c.nulls[ri] if c.nulls is not None
                                else None))
        pair_sel = lb.sel[li] & rb.sel[ri]
        pb = Batch(tuple(pcols), pair_sel,
                   pair_sel.astype(jnp.int32).sum())
        md, mn = evaluate(node.extra, pb)
        match = pair_sel & md.astype(bool)
        if mn is not None:
            match = match & ~mn
        m2 = match.reshape(nl, nr)
        lmatched = m2.any(axis=1)
        rmatched = m2.any(axis=0)

        cols = []
        zero_l = [jnp.zeros(extra_r, c.data.dtype) for c in lb.columns]
        zero_r = [jnp.zeros(extra_l, c.data.dtype) for c in rb.columns]
        for j, c in enumerate(lb.columns):
            parts = [c.data[li]]
            nparts = [c.nulls[li] if c.nulls is not None
                      else jnp.zeros(nl * nr, bool)]
            if extra_l:
                parts.append(c.data)
                nparts.append(c.nulls if c.nulls is not None
                              else jnp.zeros(nl, bool))
            if extra_r:
                parts.append(zero_l[j])
                nparts.append(jnp.ones(extra_r, bool))
            cols.append(Column(_pad(jnp.concatenate(parts), cap),
                               _pad(jnp.concatenate(nparts), cap)))
        for j, c in enumerate(rb.columns):
            parts = [c.data[ri]]
            nparts = [c.nulls[ri] if c.nulls is not None
                      else jnp.zeros(nl * nr, bool)]
            if extra_l:
                parts.append(zero_r[j])
                nparts.append(jnp.ones(extra_l, bool))
            if extra_r:
                parts.append(c.data)
                nparts.append(c.nulls if c.nulls is not None
                              else jnp.zeros(nr, bool))
            cols.append(Column(_pad(jnp.concatenate(parts), cap),
                               _pad(jnp.concatenate(nparts), cap)))
        selparts = [match]
        if extra_l:
            selparts.append(lb.sel & ~lmatched)
        if extra_r:
            selparts.append(rb.sel & ~rmatched)
        sel = _pad(jnp.concatenate(selparts), cap)
        return Batch(tuple(cols), sel, sel.astype(jnp.int32).sum())

    return node.schema, _lazy(node, ("nl_outer", jt, cap, nl, nr),
                              kern, lb, rb)


def _exec_join(node: L.Join, ctx):
    if not node.conds and node.range_cond is None \
            and node.extra is not None \
            and node.join_type in ("left", "right", "full"):
        return _exec_nl_outer(node, ctx)
    lschema, lbz = _execute(node.left, ctx)
    rschema, rbz = _execute(node.right, ctx)
    jt = node.join_type

    def keys_kern(lb, rb):
        if node.asof:
            le, rop, re_ = node.range_cond
            ld, ln = evaluate(le, lb)
            rd, rn = evaluate(re_, rb)
            lt = sortkey._orderable(ld, le.dtype).astype(jnp.int64)
            rt = sortkey._orderable(rd, re_.dtype).astype(jnp.int64)
            if rop in ("<", "<="):
                # earliest build >= probe ≡ latest over negated times
                lt = ~lt
                rt = ~rt
            strict = rop in ("<", ">")
            l_live = _combine_live(lb.sel, [ln])
            r_live = _combine_live(rb.sel, [rn])
            if node.conds:
                lds, lns = _key_arrays(node.conds, lb, "left")
                rds, rns = _key_arrays(node.conds, rb, "right")
                l_live = _combine_live(l_live, lns)
                r_live = _combine_live(r_live, rns)
                if len(lds) == 1:
                    lk, rk = lds[0], rds[0]
                else:
                    lk, rk = _densify_keys(lds, l_live, rds, r_live)
                    l_live = l_live & (lk >= 0)
                    r_live = r_live & (rk >= 0)
            else:
                lk = jnp.zeros(lb.sel.shape[0], jnp.int64)
                rk = jnp.zeros(rb.sel.shape[0], jnp.int64)
            return join_ops.asof_probe(rk, rt, r_live, lk, lt, l_live,
                                       strict)
        if not node.conds and node.range_cond is not None:
            # sort-based range join: order-preserving key encodings
            le, rop, re_ = node.range_cond
            ld, ln = evaluate(le, lb)
            rd, rn = evaluate(re_, rb)
            lk = sortkey._orderable(ld, le.dtype).astype(jnp.int64)
            rk = sortkey._orderable(rd, re_.dtype).astype(jnp.int64)
            l_live = _combine_live(lb.sel, [ln])
            r_live = _combine_live(rb.sel, [rn])
            bt = join_ops.build(rk, None, r_live)
            lo, cnt = join_ops.range_probe(bt, lk, None, l_live, rop)
            return bt, lo, cnt
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
        return bt, lo, cnt

    probe = _lazy(node, "probe", keys_kern, lbz, rbz)

    if jt in ("semi", "anti", "mark") and node.extra is None:
        # fully fused — no host decision needed at all
        def kern(lb, rb, pr):
            _, _, cnt = pr
            has = cnt > 0
            if jt == "semi":
                m = lb.sel & has
                return Batch(lb.columns, m, m.astype(jnp.int32).sum())
            if jt == "anti":
                m = lb.sel & ~has
                return Batch(lb.columns, m, m.astype(jnp.int32).sum())
            mnull = _mark_nulls(node, lb, rb, has) \
                if (node.mark_in and node.conds) else None
            cols = lb.columns + (Column(has, mnull),)
            return Batch(cols, lb.sel, lb.count)

        return node.schema, _lazy(node, "semi", kern, lbz, rbz, probe)

    # breaker: ONE fused stage for both children + probe, ONE stats fetch
    def join_stats(lb, rb, pr):
        return jnp.stack([join_ops.match_total(pr[2]),
                          lb.count.astype(jnp.int64),
                          rb.count.astype(jnp.int64)])

    statsz = _lazy(node, "stats", join_stats, lbz, rbz, probe)
    lb, rb, (bt, lo, cnt), st = _force(node, [lbz, rbz, probe, statsz])
    total, n_l_live, n_r_live = (int(x) for x in np.asarray(st))

    cap_l = lb.sel.shape[0]
    cap_r = rb.sel.shape[0]

    # adaptive recompaction: when a side is very sparse (selective filters
    # upstream), shrinking it makes the re-probe + expansion gathers far
    # cheaper than the wasted first probe (the analog of the reference's
    # dynamic radix-bit repartitioning, join_hashtable.hpp:375-428)
    if (bucket_capacity(max(n_l_live, 1)) <= cap_l // 8
            or bucket_capacity(max(n_r_live, 1)) <= cap_r // 8):
        lbc = _compact_lazy(node, lb, n_l_live, tag="lcomp")
        rbc = _compact_lazy(node, rb, n_r_live, tag="rcomp")
        probe2 = _lazy(node, "probe2", keys_kern, lbc, rbc)
        stats2 = _lazy(node, "stats2", join_stats, lbc, rbc, probe2)
        lb, rb, (bt, lo, cnt), st = _force(
            node, [lbc, rbc, probe2, stats2])
        total, n_l_live, n_r_live = (int(x) for x in np.asarray(st))
        cap_l = lb.sel.shape[0]
        cap_r = rb.sel.shape[0]

    if jt in ("semi", "anti", "mark"):
        # residual condition: expand matches, filter pairs, then reduce to
        # a per-probe-row matched flag (reference: ScanStructure semi/anti
        # with non-equality conditions, physical_hash_join.cpp)
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
            tgt = jnp.where(m, pi, cap_l)
            matched = jnp.zeros(cap_l + 1, dtype=jnp.int32) \
                .at[tgt].max(1, mode="drop")[:cap_l] > 0
            if jt == "semi":
                msel = lb.sel & matched
                return Batch(lb.columns, msel, msel.astype(jnp.int32).sum())
            if jt == "anti":
                msel = lb.sel & ~matched
                return Batch(lb.columns, msel, msel.astype(jnp.int32).sum())
            mnull = _mark_nulls(node, lb, rb, matched) \
                if (node.mark_in and node.conds) else None
            cols2 = lb.columns + (Column(matched, mnull),)
            return Batch(cols2, lb.sel, lb.count)

        return node.schema, _lazy(node, ("semi_extra", out_cap, cap_l),
                                  match_kern, lb, rb, bt, lo, cnt)

    # inner/left/right/full: ONE kernel builds matches + outer-unmatched
    # rows into statically-partitioned regions of the output (no concat):
    # [0, out_cap) = expanded matches, then cap_l left-outer slots, then
    # cap_r right-outer slots, each validated by its own mask.
    out_cap = bucket_capacity(max(total, 1))
    ext_l = cap_l if jt in ("left", "full") else 0
    ext_r = cap_r if jt in ("right", "full") else 0

    def expand_kern(lb, rb, bt, lo, cnt):
        pi, bpos, valid = join_ops.expand(lo, cnt, out_cap)
        brow = bt.srow[bpos]
        if node.extra is not None:
            pair_cols = []
            for c in lb.columns:
                pair_cols.append(Column(
                    c.data[pi],
                    c.nulls[pi] if c.nulls is not None else None))
            for c in rb.columns:
                pair_cols.append(Column(
                    c.data[brow],
                    c.nulls[brow] if c.nulls is not None else None))
            pairs = Batch(tuple(pair_cols), valid,
                          valid.astype(jnp.int32).sum())
            m = select_mask(node.extra, pairs)
            valid = valid & m
            p_t = jnp.where(valid, pi, cap_l)
            probe_matched = jnp.zeros(cap_l + 1, jnp.int32) \
                .at[p_t].max(1, mode="drop")[:cap_l] > 0
            b_t = jnp.where(valid, brow, cap_r)
            build_matched = jnp.zeros(cap_r + 1, jnp.int32) \
                .at[b_t].max(1, mode="drop")[:cap_r] > 0
        else:
            probe_matched = cnt > 0
            build_matched = join_ops.matched_build_mask(bt, lo, cnt, cap_r) \
                if ext_r else None

        def assemble(col_parts, dtype, any_null):
            datas, nullsl = [], []
            for d, n in col_parts:
                datas.append(d)
                if any_null:
                    nullsl.append(n if n is not None
                                  else jnp.zeros(d.shape[0], dtype=bool))
            dd = jnp.concatenate(datas) if len(datas) > 1 else datas[0]
            nn = (jnp.concatenate(nullsl) if len(nullsl) > 1
                  else nullsl[0]) if any_null else None
            return Column(dd, nn)

        cols = []
        for c in lb.columns:
            parts = [(c.data[pi],
                      c.nulls[pi] if c.nulls is not None else None)]
            if ext_l:
                parts.append((c.data, c.nulls))
            if ext_r:
                parts.append((jnp.zeros(cap_r, dtype=c.data.dtype),
                              jnp.ones(cap_r, dtype=bool)))
            any_null = c.nulls is not None or bool(ext_r)
            cols.append(assemble(parts, c.data.dtype, any_null))
        for c in rb.columns:
            parts = [(c.data[brow],
                      c.nulls[brow] if c.nulls is not None else None)]
            if ext_l:
                parts.append((jnp.zeros(cap_l, dtype=c.data.dtype),
                              jnp.ones(cap_l, dtype=bool)))
            if ext_r:
                parts.append((c.data, c.nulls))
            any_null = c.nulls is not None or bool(ext_l)
            cols.append(assemble(parts, c.data.dtype, any_null))
        sels = [valid]
        if ext_l:
            sels.append(lb.sel & ~probe_matched)
        if ext_r:
            sels.append(rb.sel & ~build_matched)
        sel = jnp.concatenate(sels) if len(sels) > 1 else sels[0]
        return Batch(tuple(cols), sel, sel.astype(jnp.int32).sum())

    out = _lazy(node, ("expand", out_cap, ext_l, ext_r, cap_l, cap_r),
                expand_kern, lb, rb, bt, lo, cnt)
    return node.schema, out


def _concat_batches(node, parts, ns: List[int]):
    """Concatenate batches (same column layout), preserving live rows.

    Each part is first compacted (live rows to the front), then statically
    sliced to its host-known live count, so parts pack densely.  Parts must
    be concrete (a breaker already fetched their live counts)."""
    total = sum(ns)
    cap = bucket_capacity(max(total, 1))
    compacted = []
    caps = []
    for i, (p, n) in enumerate(zip(parts, ns)):
        c = bucket_capacity(max(n, 1))
        caps.append(min(c, p.sel.shape[0]))
        compacted.append(_compact_lazy(node, p, n, tag=("ccat", i),
                                       always=True))

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

    return _lazy(node, ("concat", tuple(caps), tuple(ns), cap), kern,
                 *compacted)


def _exec_cross(node: L.CrossProduct, ctx):
    ls, lbz = _execute(node.left, ctx)
    rs, rbz = _execute(node.right, ctx)
    statsz = _lazy(node, "stats",
                   lambda lb, rb: _stack_counts(lb, rb), lbz, rbz)
    lb, rb, st = _force(node, [lbz, rbz, statsz])
    nl_live, nr_live = (int(x) for x in np.asarray(st))
    lb = _concrete(node, _compact_lazy(node, lb, nl_live, tag="lcomp"))
    rb = _concrete(node, _compact_lazy(node, rb, nr_live, tag="rcomp"))
    nl, nr = lb.sel.shape[0], rb.sel.shape[0]
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

    return node.schema, _lazy(node, ("cross", cap, nl, nr), kern, lb, rb)


def _exec_positional(node: "L.Positional", ctx):
    """Row-i-pairs-row-i join, shorter side NULL-padded (reference:
    physical_positional_join.cpp)."""
    ls, lbz = _execute(node.left, ctx)
    rs, rbz = _execute(node.right, ctx)
    statsz = _lazy(node, "stats",
                   lambda lb, rb: _stack_counts(lb, rb), lbz, rbz)
    lb, rb, st = _force(node, [lbz, rbz, statsz])
    nl, nr = (int(x) for x in np.asarray(st))
    lb = _concrete(node, _compact_lazy(node, lb, nl, tag="lcomp",
                                       always=True))
    rb = _concrete(node, _compact_lazy(node, rb, nr, tag="rcomp",
                                       always=True))
    n = max(nl, nr)
    cap = bucket_capacity(max(n, 1))

    def kern(lb, rb):
        cols = []
        for b, live in ((lb, nl), (rb, nr)):
            for c in b.columns:
                d = _pad(c.data, cap)
                nn = _pad(c.nulls, cap) if c.nulls is not None \
                    else jnp.zeros(cap, dtype=bool)
                nn = nn | (lax.iota(jnp.int32, cap) >= live)
                cols.append(Column(d, nn))
        sel = lax.iota(jnp.int32, cap) < n
        return Batch(tuple(cols), sel, jnp.int32(n))

    return node.schema, _lazy(node, ("pos", cap, nl, nr), kern, lb, rb)


def _pad(a, cap):
    pad = cap - a.shape[0]
    if pad <= 0:
        return a[:cap]
    return jnp.concatenate([a, jnp.zeros(pad, dtype=a.dtype)])


# ---- order / limit / distinct / union ------------------------------------

def _exec_order(node: L.Order, ctx):
    schema, batch = _execute(node.child, ctx)

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
            if c.hi is not None:
                carried.append(c.hi)
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
            h = None
            if c.hi is not None:
                h = rest[i]
                i += 1
            cols.append(Column(d, n, h))
        return Batch(tuple(cols), sel, b.count)

    return node.schema, _lazy(node, "order", kern, batch)


def _exec_topn(node: L.TopN, ctx):
    """Fused ORDER BY + LIMIT (reference: physical_top_n.cpp bounded heap).
    TPU design: one sort over [validity, keys, rowid] ONLY (payloads stay
    put), then a small static-shape gather of limit+offset rows per
    column — O(sort(keys)) instead of O(sort(all columns))."""
    schema, batch = _execute(node.child, ctx)
    k = min(node.limit + node.offset, 1 << 14)

    def kern(b):
        cap = b.sel.shape[0]
        key_ops = []
        for key in node.keys:
            d, n = evaluate(key.expr, b)
            key_ops.extend(sortkey.encode_key(
                d, n, key.expr.dtype, desc=key.desc,
                nulls_last=key.nulls_last))
        invalid = (~b.sel).astype(jnp.int32)
        rowid = lax.broadcasted_iota(jnp.int32, (cap,), 0)
        out = lax.sort([invalid, *key_ops, rowid],
                       num_keys=1 + len(key_ops), is_stable=True)
        kk = min(k, cap)
        rid = out[-1][:kk]
        live = out[0][:kk] == 0
        pos = lax.broadcasted_iota(jnp.int32, (kk,), 0)
        live = live & (pos >= node.offset)
        cols = []
        for c in b.columns:
            d = c.data[rid]
            n = c.nulls[rid] if c.nulls is not None else None
            h = c.hi[rid] if c.hi is not None else None
            cols.append(Column(d, n, h))
        return Batch(tuple(cols), live, live.astype(jnp.int32).sum())

    return node.schema, _lazy(node, ("topn", k, node.offset), kern, batch)


def _exec_limit(node: L.Limit, ctx):
    schema, batch = _execute(node.child, ctx)
    lim = node.limit if node.limit is not None else 1 << 60

    def kern(b):
        if node.percent is not None:
            # LIMIT n%: floor(count * pct / 100) rows (reference:
            # physical_limit_percent.cpp)
            klim = jnp.floor(b.count.astype(jnp.float64)
                             * node.percent / 100.0).astype(jnp.int64)
        else:
            klim = lim
        m = order_ops.limit_mask(b.sel, node.offset, klim)
        return Batch(b.columns, m, m.astype(jnp.int32).sum())

    return node.schema, _lazy(node, "limit", kern, batch)


def _exec_distinct(node: L.Distinct, ctx):
    schema, batch = _execute(node.child, ctx)

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

    return node.schema, _lazy(node, "distinct", kern, batch)


def _exec_window(node: L.Window, ctx):
    schema, batch = _execute(node.child, ctx)

    def kern(b):
        return local_window(node, b)

    return node.schema, _lazy(node, "window", kern, batch)


def local_window(node: L.Window, b: Batch) -> Batch:
    """Window computation over one batch — pure lax ops, reused by the
    distributed executor after a partition-key exchange."""
    from ..ops import window as win_ops

    # group fns by (partition, order) signature -> one sort per group
    groups = {}
    for i, f in enumerate(node.fns):
        key = (tuple(repr(p) for p in f.partition),
               tuple((repr(k.expr), k.desc, k.nulls_last) for k in f.order))
        groups.setdefault(key, []).append((i, f))

    if True:
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
                rows_frame = range_frame = groups_frame = None
                exclude = None
                oval = onull = None
                odesc = onf = False
                odtype = None
                if f.frame is not None:
                    fkind, pre, post = f.frame[:3]
                    exclude = f.frame[3] if len(f.frame) > 3 else None
                    if fkind == "rows":
                        rows_frame = (pre, post)
                    elif fkind == "groups":
                        groups_frame = (pre, post)
                    elif (pre, post) == (None, 0) and not exclude:
                        pass   # the dialect default frame
                    else:
                        if len(f.order) != 1:
                            raise NotImplementedError(
                                "RANGE value frame needs exactly one "
                                "ORDER BY key")
                        ok = f.order[0]
                        oval, onull = evaluate(ok.expr, b)
                        odesc = ok.desc
                        onf = not ok.nulls_last
                        odtype = ok.expr.dtype
                        range_frame = (pre, post)
                specs.append(win_ops.WindowSpec(
                    kind, data, nulls, f.offset,
                    has_order=bool(f.order),
                    rows_frame=rows_frame,
                    range_frame=range_frame,
                    order_val=oval, order_val_nulls=onull,
                    order_desc=odesc, order_nulls_first=onf,
                    order_dtype=odtype,
                    groups_frame=groups_frame,
                    exclude=exclude,
                    distinct=getattr(f, "distinct", False)))
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


def _exec_union(node: L.Union, ctx):
    ls, lbz = _execute(node.left, ctx)
    rs, rbz = _execute(node.right, ctx)
    statsz = _lazy(node, "stats",
                   lambda lb, rb: _stack_counts(lb, rb), lbz, rbz)
    lb, rb, st = _force(node, [lbz, rbz, statsz])
    ns = [int(x) for x in np.asarray(st)]
    return node.schema, _concat_batches(node, [lb, rb], ns)


def _exec_sample(node: L.Sample, ctx):
    schema, batch = _execute(node.child, ctx)
    seed = int(node.seed)

    def kern(b):
        cap = b.sel.shape[0]
        key = jax.random.PRNGKey(seed)
        u = jax.random.uniform(key, (cap,))
        if node.method == "percent":
            m = b.sel & (u < node.amount / 100.0)
            return Batch(b.columns, m, m.astype(jnp.int32).sum())
        # reservoir-style n-row sample: rank live rows by random draw —
        # one sort + inverse permutation, scatter-free
        inv = (~b.sel).astype(jnp.int32)
        rowid = lax.broadcasted_iota(jnp.int32, (cap,), 0)
        _, _, rid_s = lax.sort([inv, u, rowid], num_keys=2,
                               is_stable=False)
        pos = lax.broadcasted_iota(jnp.int32, (cap,), 0)
        _, rank = lax.sort([rid_s, pos], num_keys=1, is_stable=False)
        m = b.sel & (rank < int(node.amount))
        return Batch(b.columns, m, m.astype(jnp.int32).sum())

    return node.schema, _lazy(node, ("sample", seed), kern, batch)


# ---- recursive CTEs --------------------------------------------------------

_MAX_RECURSION = 100000


def _exec_cte_ref(node: L.CTERef, ctx):
    if node.cell is None or node.cell.batch is None:
        raise RuntimeError(f"recursive CTE ref {node.name} outside its "
                           "fixpoint loop")
    return node.schema, node.cell.batch


def _count_lazy(node, tag, bz):
    return _lazy(node, tag, lambda b: b.count.astype(jnp.int32)[None], bz)


def _distinct_kern(schema):
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
    return kern


def _new_rows_kern(schema):
    """Rows of `res` not present in `acc`, de-duplicated (UNION recursion
    step; reference: physical_recursive_cte.cpp ProbeHT).  One combined
    sort: a res row is NEW iff it is the first of its key group."""
    def kern(acc, res):
        na, nr = acc.sel.shape[0], res.sel.shape[0]
        n = na + nr
        live = jnp.concatenate([acc.sel, res.sel])
        inv = (~live).astype(jnp.int32)
        key_ops = []
        for i, f in enumerate(schema.fields):
            ca, cr = acc.columns[i], res.columns[i]
            d = jnp.concatenate([ca.data, cr.data])
            anull = ca.nulls is not None or cr.nulls is not None
            nn = None
            if anull:
                nn = jnp.concatenate([
                    ca.nulls if ca.nulls is not None
                    else jnp.zeros(na, bool),
                    cr.nulls if cr.nulls is not None
                    else jnp.zeros(nr, bool)])
            key_ops.extend(sortkey.encode_key(d, nn, f.dtype))
        flag = jnp.concatenate([jnp.zeros(na, jnp.int32),
                                jnp.ones(nr, jnp.int32)])
        carried = []
        ncarry = []
        for i, f in enumerate(schema.fields):
            ca, cr = acc.columns[i], res.columns[i]
            anull = ca.nulls is not None or cr.nulls is not None
            carried.append(jnp.concatenate([ca.data, cr.data]))
            if anull:
                carried.append(jnp.concatenate([
                    (ca.nulls if ca.nulls is not None
                     else jnp.zeros(na, bool)),
                    (cr.nulls if cr.nulls is not None
                     else jnp.zeros(nr, bool))]).astype(jnp.int8))
            ncarry.append(anull)
        nkeys = 1 + len(key_ops) + 1    # inv, keys..., flag
        out = lax.sort([inv, *key_ops, flag, *carried], num_keys=nkeys,
                       is_stable=True)
        inv_s = out[0]
        keys_s = out[1:1 + len(key_ops)]
        flag_s = out[1 + len(key_ops)]
        rest = out[nkeys:]
        first = jnp.zeros(n, dtype=bool).at[0].set(True)
        for k in keys_s:
            first = first | jnp.concatenate(
                [jnp.ones(1, dtype=bool), k[1:] != k[:-1]])
        new = first & (flag_s == 1) & (inv_s == 0)
        cols = []
        i = 0
        for has_null in ncarry:
            d = rest[i]
            i += 1
            nn = None
            if has_null:
                nn = rest[i] != 0
                i += 1
            cols.append(Column(d, nn))
        return Batch(tuple(cols), new, new.astype(jnp.int32).sum())
    return kern


def _exec_recursive_cte(node: L.RecursiveCTE, ctx):
    schema = node.schema
    sb, basez = _execute(node.base, ctx)
    if not node.union_all:
        basez = _lazy(node, "bdedup", _distinct_kern(schema), basez)
    base, st = _force(node, [basez, _count_lazy(node, "bstat", basez)])
    n = int(np.asarray(st)[0])
    base = _concrete(node, _compact_lazy(node, base, n, tag="bcomp",
                                         always=True))
    parts, ns = [base], [n]
    acc = base
    n_acc = n
    working = base
    it = 0
    while n > 0:
        it += 1
        if it > _MAX_RECURSION:
            raise RuntimeError("recursive CTE exceeded max iteration "
                               f"count ({_MAX_RECURSION})")
        node.cell.batch = working
        rs, resz = _execute(node.recursive, ctx)
        if node.union_all:
            res, st = _force(node, [resz,
                                    _count_lazy(node, "rstat", resz)])
            n = int(np.asarray(st)[0])
            if n == 0:
                break
            res = _concrete(node, _compact_lazy(node, res, n, tag="wcomp",
                                                always=True))
            parts.append(res)
            ns.append(n)
            working = res
        else:
            newz = _lazy(node, "newrows", _new_rows_kern(schema),
                         acc, resz)
            new, st = _force(node, [newz,
                                    _count_lazy(node, "nstat", newz)])
            n = int(np.asarray(st)[0])
            if n == 0:
                break
            new = _concrete(node, _compact_lazy(node, new, n, tag="ncomp",
                                                always=True))
            parts.append(new)
            ns.append(n)
            n_acc += n
            acc = _concrete(node, _concat_batches(
                node, [acc, new], [n_acc - n, n]))
            working = new
    node.cell.batch = None
    return schema, _concat_batches(node, parts, ns)


def _exec_materialize(node: "L.Materialize", ctx):
    """Shared CTE barrier: compute the child once per query, memoize the
    CONCRETE batch so every referencing site reuses both the compilation
    and the result (reference: materialized CTE execution,
    operator/set/physical_cte.cpp)."""
    hit = ctx.memo.get(id(node))
    if hit is None:
        schema, b = _execute(node.child, ctx)
        hit = (node.schema, _concrete(node.child, b))
        ctx.memo[id(node)] = hit
    return hit


class ConstBatch(L.LogicalNode):
    """Pre-materialized batch as a leaf plan node — used by the
    distributed executor to splice gathered results into a local
    sub-plan without mutating the dispatch table per call."""

    def __init__(self, schema, batch):
        self.schema = schema
        self.batch = batch

    def children(self):
        return []


_EXEC = {
    ConstBatch: lambda n, c: (n.schema, n.batch),
    L.Get: _exec_get,
    L.Materialize: _exec_materialize,
    L.Filter: _exec_filter,
    L.Project: _exec_project,
    L.Aggregate: _exec_aggregate,
    L.Join: _exec_join,
    L.CrossProduct: _exec_cross,
    L.Positional: _exec_positional,
    L.Order: _exec_order,
    L.Window: _exec_window,
    L.Limit: _exec_limit,
    L.Distinct: _exec_distinct,
    L.Union: _exec_union,
    L.TopN: _exec_topn,
    L.Unnest: _exec_unnest,
    L.CTERef: _exec_cte_ref,
    L.RecursiveCTE: _exec_recursive_cte,
    L.Sample: _exec_sample,
}
