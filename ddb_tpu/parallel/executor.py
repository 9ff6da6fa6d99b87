"""Distributed plan executor: SQL plans over a device mesh.

Executes bound logical plans with base tables ROW-SHARDED across the mesh
(the reference's morsel-parallelism mapped to SPMD shards, SURVEY.md
section 2.5 TPU mapping):

  Get/Filter/Project  data-parallel (XLA auto-partitions elementwise work)
  Aggregate           local partial aggregate per shard -> hash exchange of
                      partials (ICI all_to_all) -> final aggregate; the
                      local pre-aggregation absorbs key skew
  Join                hash exchange of both sides -> local sorted-merge
                      join per shard (co-partitioned keys)
  Order/Limit/rest    gathered to a single device (post-aggregation
                      result sets are small; large-sort fallback later)

Capacity management mirrors the single-chip executor: host-chosen
power-of-two capacities; exchanges return overflow counters and the host
retries with doubled capacity (skew backstop).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import types as T
from ..batch import Batch, Column, Schema, bucket_capacity
from ..expr import ir
from ..expr.compile import evaluate, select_mask
from ..ops import aggregate as agg_ops
from ..ops import join as join_ops
from ..ops import sortkey
from ..plan import logical as L
from ..plan import physical
from ..types import TypeId
from .exchange import exchange_by_key
from .mesh import AXIS, shard_map

# aggregate kinds the distributed path decomposes into mergeable partials
_DIST_AGG_KINDS = {"sum", "sum_float", "count", "count_star", "min",
                   "max", "avg"}


class DistContext:
    def __init__(self, mesh):
        self.mesh = mesh
        self.n = mesh.shape[AXIS]

    def shard(self, arr):
        return jax.device_put(arr, NamedSharding(self.mesh, P(AXIS)))

    def shard_batch(self, batch: Batch, cap: Optional[int] = None) -> Batch:
        """Re-pad a batch so capacity divides the mesh and shard rows."""
        n = self.n
        if cap is None:
            cap = max(bucket_capacity(batch.capacity), n * 128)
        cols = []
        for c in batch.columns:
            cols.append(Column(self.shard(_pad_to(c.data, cap)),
                               self.shard(_pad_to(c.nulls, cap))
                               if c.nulls is not None else None))
        sel = self.shard(_pad_to(batch.sel, cap))
        return Batch(tuple(cols), sel, batch.count)


# skew/overflow observability: each doubling retry of an exchange
# capacity increments this (BASELINE config 4 skew-aware repartition
# evidence; scripts/run_h2oai_scale.py reports it)
STATS = {"exchange_retries": 0, "exchange_overflow_rows": 0}


def _pad_to(a, cap):
    if a.shape[0] == cap:
        return a
    if a.shape[0] > cap:
        return a[:cap]
    return jnp.concatenate([a, jnp.zeros(cap - a.shape[0],
                                         dtype=a.dtype)])


def execute_distributed(plan: L.LogicalNode, mesh) -> Tuple[Schema, Batch]:
    """Execute a plan over the mesh; result is gathered (addressable)."""
    ctx = DistContext(mesh)
    schema, batch = _exec(plan, ctx)
    # gather to host-addressable layout
    cols = tuple(Column(jnp.asarray(np.asarray(c.data)),
                        jnp.asarray(np.asarray(c.nulls))
                        if c.nulls is not None else None)
                 for c in batch.columns)
    sel = jnp.asarray(np.asarray(batch.sel))
    return schema, Batch(cols, sel, batch.count)


def _exec(node: L.LogicalNode, ctx: DistContext):
    if isinstance(node, (L.RecursiveCTE, L.CTERef)):
        # fixpoint loops are host-driven; run them on the single-device
        # executor (their inputs are small working tables)
        return physical.execute(node)
    if isinstance(node, L.Get):
        return _exec_get(node, ctx)
    if isinstance(node, L.Filter):
        schema, b = _exec(node.child, ctx)
        m = select_mask(node.predicate, b)
        return node.schema, Batch(b.columns, m, m.astype(jnp.int32).sum())
    if isinstance(node, L.Project):
        schema, b = _exec(node.child, ctx)
        cols = []
        for e in node.exprs:
            d, n = evaluate(e, b)
            cols.append(Column(d, n))
        return node.schema, Batch(tuple(cols), b.sel, b.count)
    if isinstance(node, L.Aggregate):
        return _exec_aggregate(node, ctx)
    if isinstance(node, L.Join):
        return _exec_join(node, ctx)
    if isinstance(node, L.Order):
        return _exec_order(node, ctx)
    if isinstance(node, L.Distinct):
        return _exec_distinct(node, ctx)
    if isinstance(node, L.Window):
        return _exec_window(node, ctx)
    if isinstance(node, L.Limit):
        return _exec_limit(node, ctx)
    # everything else: gather and run the single-device executor
    return _exec_gathered(node, ctx)


def _exec_limit(node: L.Limit, ctx: DistContext):
    """Distributed TopN: LIMIT over ORDER BY keeps only the per-shard
    local top-(limit+offset) rows, gathers those few, and finishes with
    one tiny single-device sort — no full-result gather (reference:
    PhysicalTopN per-thread heaps merged at finalize,
    src/execution/operator/order/physical_top_n.cpp)."""
    child = node.child
    k = None
    if node.limit is not None and node.percent is None:
        k = int(node.limit) + int(node.offset or 0)
    if not isinstance(child, L.Order) and node.percent is None \
            and (node.limit is not None or node.offset):
        # plain LIMIT/OFFSET (no ORDER BY): rows stay sharded — each
        # shard keeps rows whose global selected-row index falls in
        # [offset, offset+limit), computed from an all_gather of the
        # per-shard counts (reference: PhysicalLimit shares a global
        # row counter across threads, physical_limit.cpp)
        schema, b = _exec(child, ctx)
        off = int(node.offset or 0)
        lim = int(node.limit) if node.limit is not None else None

        def kern(sel):
            s = sel.reshape(-1)
            local = jnp.cumsum(s.astype(jnp.int64))
            totals = lax.all_gather(local[-1], AXIS)
            rank = lax.axis_index(AXIS)
            base = jnp.sum(jnp.where(jnp.arange(ctx.n) < rank,
                                     totals, 0))
            gidx = base + local - 1
            keep = s & (gidx >= off)
            if lim is not None:
                keep = keep & (gidx < off + lim)
            return keep[None]

        fn = shard_map(kern, mesh=ctx.mesh, in_specs=P(AXIS),
                       out_specs=P(AXIS))
        sel2 = jax.jit(fn)(b.sel).reshape(-1)
        return node.schema, Batch(b.columns, sel2,
                                  sel2.astype(jnp.int32).sum())
    if not isinstance(child, L.Order) or k is None or k > 1 << 16:
        return _exec_gathered(node, ctx)
    schema, b = _exec(child.child, ctx)
    kcap = bucket_capacity(max(k, 128))

    def kern(*arrs):
        bb, _ = _unflatten_batch(arrs, b)
        n_local = bb.sel.shape[0]
        key_ops = []
        for key in child.keys:
            d, nmask = evaluate(key.expr, bb)
            key_ops.extend(sortkey.encode_key(
                d, nmask, key.expr.dtype, desc=key.desc,
                nulls_last=key.nulls_last))
        rowid = lax.broadcasted_iota(jnp.int32, (n_local,), 0)
        invalid = (~bb.sel).astype(jnp.int32)
        out = lax.sort([invalid, *key_ops, rowid],
                       num_keys=2 + len(key_ops), is_stable=False)
        perm = out[-1][:kcap]
        valid = out[0][:kcap] == 0
        cols_flat = []
        for c in bb.columns:
            cols_flat.append(jnp.take(c.data, perm))
            nn = (c.nulls if c.nulls is not None
                  else jnp.zeros(n_local, bool))
            cols_flat.append(jnp.take(nn.astype(jnp.int8), perm))
        return tuple(x[None] for x in cols_flat) + (valid[None],)

    flat, _ = _flatten_batch(b)
    fn = shard_map(kern, mesh=ctx.mesh,
                   in_specs=tuple(P(AXIS) for _ in flat),
                   out_specs=P(AXIS))
    outs = jax.jit(fn)(*flat)
    sel = jnp.asarray(np.asarray(outs[-1]).reshape(-1))
    arrays = [jnp.asarray(np.asarray(o).reshape(-1))
              for o in outs[:-1]]
    cols = []
    for j, c in enumerate(b.columns):
        d = arrays[2 * j]
        nn = arrays[2 * j + 1] != 0
        cols.append(Column(d, nn if bool(jnp.any(nn)) else None))
    small = Batch(tuple(cols), sel, sel.astype(jnp.int32).sum())

    # final: tiny single-device Order + Limit over n_shards*kcap rows
    src = physical.ConstBatch(child.child.schema, small)
    import copy
    order2 = copy.copy(child)
    order2.child = src
    lim2 = copy.copy(node)
    lim2.child = order2
    return physical.execute(lim2)


def _exec_window(node: L.Window, ctx: DistContext):
    """Distributed window functions: hash-exchange raw rows on the
    PARTITION BY keys so each partition is wholly on one shard, then
    run the single-device window kernel per shard (SURVEY 2.5 TPU
    mapping; reference: PartitionedHashGroup in
    src/function/window/window_executor.cpp).  Requires every window
    fn to share one non-empty partition signature; otherwise the
    result is inherently global and gathers."""
    sigs = {tuple(repr(p) for p in f.partition) for f in node.fns}
    if len(sigs) != 1 or not node.fns[0].partition:
        return _exec_gathered(node, ctx)
    schema, b = _exec(node.child, ctx)
    n_shards = ctx.n
    per_shard = b.capacity // n_shards
    ex_cap = bucket_capacity(
        max(per_shard * 2 // max(n_shards // 2, 1), 256))

    def kern(ex_cap_, *arrs):
        from ..ops import hashing
        from .exchange import all_to_all_exchange
        bb, _ = _unflatten_batch(arrs, b)
        cap_l = bb.sel.shape[0]
        h = jnp.zeros(cap_l, dtype=jnp.uint64)
        for p in node.fns[0].partition:
            d, nmask = evaluate(p, bb)
            k = d.astype(jnp.int64)
            if nmask is not None:
                k = jnp.where(nmask, jnp.int64(-1), k)
            h = hashing.hash_combine(h, k)
        pid = (h >> jnp.uint64(33)).astype(jnp.int32) % n_shards
        arrays = []
        for c in bb.columns:
            arrays.append(c.data)
            arrays.append((c.nulls if c.nulls is not None
                           else jnp.zeros(cap_l, bool))
                          .astype(jnp.int8))
        ex, evalid, overflow = all_to_all_exchange(
            arrays, bb.sel, pid, n_shards, ex_cap_)
        cols = []
        i = 0
        for c in bb.columns:
            dd = ex[i]
            i += 1
            nn = ex[i] != 0
            i += 1
            cols.append(Column(dd, nn if c.nulls is not None else None))
        eb = Batch(tuple(cols), evalid,
                   evalid.astype(jnp.int32).sum())
        out = physical.local_window(node, eb)
        flat_out = []
        for c in out.columns:
            flat_out.append(c.data)
            flat_out.append((c.nulls if c.nulls is not None
                             else jnp.zeros(c.data.shape[0], bool))
                            .astype(jnp.int8))
        return tuple(x[None] for x in flat_out) \
            + (out.sel[None], overflow[None])

    flat, _ = _flatten_batch(b)
    for attempt in range(5):
        fn = shard_map(functools.partial(kern, ex_cap),
                       mesh=ctx.mesh,
                       in_specs=tuple(P(AXIS) for _ in flat),
                       out_specs=P(AXIS))
        outs = jax.jit(fn)(*flat)
        overflow = int(jnp.sum(outs[-1]))
        if overflow == 0:
            break
        STATS["exchange_retries"] += 1
        STATS["exchange_overflow_rows"] += overflow
        ex_cap = bucket_capacity(ex_cap * 2)
    else:
        raise RuntimeError("window exchange overflow after retries")
    gsel = outs[-2].reshape(-1)
    arrays = [o.reshape(-1) for o in outs[:-2]]
    cols = []
    for j in range(len(node.schema.fields)):
        d = arrays[2 * j]
        nn = arrays[2 * j + 1] != 0
        cols.append(Column(d, nn if bool(jnp.any(nn)) else None))
    return node.schema, Batch(tuple(cols), gsel,
                              gsel.astype(jnp.int32).sum())


def _exec_gathered(node: L.LogicalNode, ctx: DistContext):
    """Fallback: execute children distributed, gather, then run the
    single-device operator (Order/Limit/Window/... on final results)."""
    kids = node.children()
    if not kids:
        return physical.execute(node)
    import copy
    gathered = []
    for k in kids:
        ks, kb = _exec(k, ctx)
        cols = tuple(Column(jnp.asarray(np.asarray(c.data)),
                            jnp.asarray(np.asarray(c.nulls))
                            if c.nulls is not None else None)
                     for c in kb.columns)
        kb = Batch(cols, jnp.asarray(np.asarray(kb.sel)), kb.count)
        gathered.append((k, kb))

    # wrap gathered batches as constant sources
    new = copy.copy(node)
    for attr in ("child", "left", "right"):
        if hasattr(new, attr):
            old = getattr(node, attr)
            for k, kb in gathered:
                if k is old:
                    setattr(new, attr,
                            physical.ConstBatch(k.schema, kb))
    return physical.execute(new)


def _exec_get(node: L.Get, ctx: DistContext):
    batch = node.table.device_batch(node.column_indices)
    cap = bucket_capacity(max(batch.capacity, ctx.n * 128))
    b = ctx.shard_batch(batch, cap)
    if node.filters:
        pred = ir.make_and(node.filters)
        m = select_mask(pred, b)
        b = Batch(b.columns, m, m.astype(jnp.int32).sum())
    return node.schema, b


# ---------------------------------------------------------------------------
# distributed aggregate
# ---------------------------------------------------------------------------

# jit-safe special aggregates: need full rows co-located per group, so
# the distributed path exchanges RAW rows by group hash instead of
# mergeable partials (reference: distinct_aggregate_data.cpp — the
# reference also re-partitions full inputs for these)
_ROW_EXCHANGE_KINDS = {"quantile", "mode", "entropy", "arg_min",
                       "arg_max", "median", "approx_count_distinct"}


def _exec_aggregate(node: L.Aggregate, ctx: DistContext):
    schema, b = _exec(node.child, ctx)

    from ..plan.physical import _HOST_AGG_KINDS, _wide_aggs
    needs_rows = any(
        (a.distinct and a.kind != "count_star")
        or a.kind in _ROW_EXCHANGE_KINDS for a in node.aggs)
    unsupported = any(
        a.kind in _HOST_AGG_KINDS
        or (a.kind not in _DIST_AGG_KINDS
            and a.kind not in _ROW_EXCHANGE_KINDS
            and a.kind != "count_star") for a in node.aggs)
    if unsupported or (needs_rows and
                       (not node.groups or _wide_aggs(node, 1))):
        # host-finalized aggregates / ungrouped specials: children run
        # distributed, the final (small) aggregation gathers
        return _exec_gathered(node, ctx)
    if needs_rows:
        return _exec_aggregate_rows(node, ctx, b)

    if not node.groups:
        # ungrouped: local partials + psum-style final on host
        ps = physical._payloads(node, b)
        # decompose avg into (sum, count)
        # run local ungrouped aggregation per shard via shard_map
        return _exec_ungrouped(node, ctx, b, ps)

    n_shards = ctx.n
    per_shard = b.capacity // n_shards
    gcap_local = per_shard
    ex_cap = bucket_capacity(max(per_shard // max(n_shards // 2, 1), 128))

    def build_payloads(bb):
        return physical._payloads(node, bb)

    def kern(*arrs):
        bb, layout = _unflatten_batch(arrs, b)
        key_ops, key_data = [], []
        for g in node.groups:
            d, n = evaluate(g, bb)
            key_ops.extend(sortkey.encode_key(d, n, g.dtype))
            key_data.append((d, n))
        ps = build_payloads(bb)
        # decompose into mergeable partials
        parts = []          # AggPayload list for local agg
        merge_plan = []     # how to recombine: (kind, idx or (i1,i2))
        for p in ps:
            if p.kind == "avg":
                parts.append(agg_ops.AggPayload("sum", p.data, p.nulls))
                parts.append(agg_ops.AggPayload("count", p.data, p.nulls))
                merge_plan.append(("avg", len(parts) - 2, len(parts) - 1))
            else:
                parts.append(p)
                merge_plan.append((p.kind, len(parts) - 1, None))
        gcols, partials, gsel, ng = agg_ops.group_and_aggregate(
            key_ops, key_data, parts, bb.sel, gcap_local)

        # exchange partial groups by hash of the key columns
        from ..ops import hashing
        h = jnp.zeros(gcap_local, dtype=jnp.uint64)
        for (d, nmask) in gcols:
            h = hashing.hash_combine(h, d.astype(jnp.int64))
        key_arrays = []
        for (d, nmask) in gcols:
            key_arrays.append(d)
            if nmask is not None:
                key_arrays.append(nmask.astype(jnp.int8))
        partial_arrays = []
        for (d, nmask) in partials:
            partial_arrays.append(d)
            partial_arrays.append(
                (nmask if nmask is not None
                 else jnp.zeros(gcap_local, bool)).astype(jnp.int8))
        all_arrays = key_arrays + partial_arrays
        pid = (h >> jnp.uint64(33)).astype(jnp.int32) % n_shards
        from .exchange import all_to_all_exchange
        ex, evalid, overflow = all_to_all_exchange(
            all_arrays, gsel, pid, n_shards, ex_cap)

        # rebuild key/partial structures in exchanged space
        i = 0
        ekey_data = []
        for (d, nmask) in gcols:
            dd = ex[i]
            i += 1
            nn = None
            if nmask is not None:
                nn = ex[i] != 0
                i += 1
            ekey_data.append((dd, nn))
        key_ops2 = []
        for (dd, nn), g in zip(ekey_data, node.groups):
            key_ops2.extend(sortkey.encode_key(dd, nn, g.dtype))
        eparts = []
        for kidx, p in enumerate(parts):
            dd = ex[i]
            i += 1
            nn = ex[i] != 0
            i += 1
            kind2 = {"count": "sum", "count_star": "sum"}.get(
                p.kind, p.kind)
            eparts.append(agg_ops.AggPayload(kind2, dd, nn))
        final_cap = n_shards * ex_cap
        gcols2, finals, gsel2, ng2 = agg_ops.group_and_aggregate(
            key_ops2, ekey_data, eparts, evalid, final_cap)

        # recombine per original agg spec
        out_cols = []
        for (d, nmask) in gcols2:
            out_cols.append(d)
            out_cols.append((nmask if nmask is not None
                             else jnp.zeros(final_cap, bool))
                            .astype(jnp.int8))
        for kind, i1, i2 in merge_plan:
            if kind == "avg":
                s, sn = finals[i1]
                c, cn = finals[i2]
                v = s.astype(jnp.float64) / jnp.maximum(c, 1)
                out_cols.append(v)
                out_cols.append((c == 0).astype(jnp.int8))
            else:
                d, nmask = finals[i1]
                if kind in ("count", "count_star"):
                    d = jnp.where(gsel2, d, 0)
                    nmask = None
                out_cols.append(d)
                out_cols.append((nmask if nmask is not None
                                 else jnp.zeros(final_cap, bool))
                                .astype(jnp.int8))
        return tuple(x[None] for x in out_cols) + (gsel2[None],
                                                   overflow[None])

    flat, spec_in = _flatten_batch(b)
    for attempt in range(5):
        # kern reads ex_cap late-bound: each retry re-traces with the
        # doubled capacity (skew backstop the module docstring promises)
        fn = shard_map(kern, mesh=ctx.mesh,
                       in_specs=tuple(P(AXIS) for _ in flat),
                       out_specs=P(AXIS))
        outs = jax.jit(fn)(*flat)
        overflow = int(jnp.sum(outs[-1]))
        if overflow == 0:
            break
        STATS["exchange_retries"] += 1
        STATS["exchange_overflow_rows"] += overflow
        ex_cap = bucket_capacity(ex_cap * 2)
    else:
        raise RuntimeError(
            f"aggregate exchange overflow ({overflow} rows) after "
            "retries")
    gsel = outs[-2].reshape(-1)
    arrays = [o.reshape(o.shape[0] * o.shape[1], *o.shape[2:])
              for o in outs[:-2]]

    # assemble output batch
    cols = []
    i = 0
    for g, gn in zip(node.groups, node.group_names):
        d = arrays[i]
        i += 1
        nn = arrays[i] != 0
        i += 1
        cols.append(Column(d, nn if bool(jnp.any(nn)) else None))
    for a in node.aggs:
        d = arrays[i]
        i += 1
        nn = arrays[i] != 0
        i += 1
        if a.kind == "avg" and a.arg is not None \
                and a.arg.dtype.id == TypeId.DECIMAL:
            d = d / T.decimal_scale_factor(a.arg.dtype.scale)
        want = np.dtype(a.dtype.np_dtype)
        if d.dtype != want:
            d = d.astype(want)
        cols.append(Column(d, nn if bool(jnp.any(nn)) else None))
    return node.schema, Batch(tuple(cols), gsel,
                              gsel.astype(jnp.int32).sum())


def _exec_aggregate_rows(node: L.Aggregate, ctx: DistContext, b: Batch):
    """Distributed special aggregates (DISTINCT / quantile / mode /
    arg_min / arg_max / entropy): hash-exchange RAW rows by group key so
    every group lands wholly on one shard, then run the single-device
    sort-based aggregation kernel per shard (reference: the reference
    re-partitions full inputs for distinct/holistic aggregates,
    src/common/types/.../distinct_aggregate_data.cpp)."""
    n_shards = ctx.n
    per_shard = b.capacity // n_shards
    ex_cap = bucket_capacity(
        max(per_shard * 2 // max(n_shards // 2, 1), 256))

    out_layout = []       # (has_null,) per output column, set at trace

    def kern(ex_cap_, *arrs):
        from ..ops import hashing
        from .exchange import all_to_all_exchange
        bb, _ = _unflatten_batch(arrs, b)
        cap_l = bb.sel.shape[0]
        h = jnp.zeros(cap_l, dtype=jnp.uint64)
        for g in node.groups:
            d, nmask = evaluate(g, bb)
            k = d.astype(jnp.int64)
            if nmask is not None:
                k = jnp.where(nmask, jnp.int64(-1), k)
            h = hashing.hash_combine(h, k)
        pid = (h >> jnp.uint64(33)).astype(jnp.int32) % n_shards
        arrays = []
        for c in bb.columns:
            arrays.append(c.data)
            arrays.append((c.nulls if c.nulls is not None
                           else jnp.zeros(cap_l, bool))
                          .astype(jnp.int8))
        ex, evalid, overflow = all_to_all_exchange(
            arrays, bb.sel, pid, n_shards, ex_cap_)
        cols = []
        i = 0
        for c in bb.columns:
            dd = ex[i]
            i += 1
            nn = ex[i] != 0
            i += 1
            cols.append(Column(dd, nn if c.nulls is not None else None))
        eb = Batch(tuple(cols), evalid,
                   evalid.astype(jnp.int32).sum())
        out = physical.local_grouped_aggregate(node, eb)
        flat_out = []
        out_layout.clear()
        for c in out.columns:
            flat_out.append(c.data)
            flat_out.append((c.nulls if c.nulls is not None
                             else jnp.zeros(c.data.shape[0], bool))
                            .astype(jnp.int8))
            out_layout.append(c.nulls is not None)
        return tuple(x[None] for x in flat_out) \
            + (out.sel[None], overflow[None])

    flat, _ = _flatten_batch(b)
    for attempt in range(5):
        fn = shard_map(functools.partial(kern, ex_cap),
                       mesh=ctx.mesh,
                       in_specs=tuple(P(AXIS) for _ in flat),
                       out_specs=P(AXIS))
        outs = jax.jit(fn)(*flat)
        overflow = int(jnp.sum(outs[-1]))
        if overflow == 0:
            break
        STATS["exchange_retries"] += 1
        STATS["exchange_overflow_rows"] += overflow
        ex_cap = bucket_capacity(ex_cap * 2)
    else:
        raise RuntimeError("aggregate row exchange overflow after "
                           "retries")
    gsel = outs[-2].reshape(-1)
    arrays = [o.reshape(-1) for o in outs[:-2]]
    cols = []
    for j in range(len(node.schema.fields)):
        d = arrays[2 * j]
        nn = arrays[2 * j + 1] != 0
        cols.append(Column(d, nn if bool(jnp.any(nn)) else None))
    return node.schema, Batch(tuple(cols), gsel,
                              gsel.astype(jnp.int32).sum())


def _exec_ungrouped(node, ctx, b, ps):
    """Distributed ungrouped aggregate: jit over sharded arrays lets XLA
    insert the cross-shard reductions (psum)."""
    res = agg_ops.ungrouped_aggregate(ps, b.sel)
    cols = []
    for a, (v, isn) in zip(node.aggs, res):
        if a.kind == "avg" and a.arg is not None \
                and a.arg.dtype.id == TypeId.DECIMAL:
            v = v / T.decimal_scale_factor(a.arg.dtype.scale)
        want = np.dtype(a.dtype.np_dtype)
        d = jnp.zeros(128, dtype=want).at[0].set(v.astype(want))
        n = None
        if isn is not None:
            n = jnp.zeros(128, dtype=bool).at[0].set(isn)
        cols.append(Column(d, n))
    sel = jnp.zeros(128, dtype=bool).at[0].set(True)
    return node.schema, Batch(tuple(cols), sel, jnp.int32(1))


# ---------------------------------------------------------------------------
# distributed join
# ---------------------------------------------------------------------------

def _exec_join(node: L.Join, ctx: DistContext):
    """Distributed equi-join: hash co-partition BOTH sides on the join
    keys (ICI all_to_all), then each shard resolves its partition locally
    — including outer/mark semantics, which are shard-local facts once
    equal keys are co-located (reference: partitioned hash join,
    physical_hash_join.cpp:542-600 per-partition finalize).

    Covers inner/left/right/full/semi/anti/mark, multi-condition keys
    (combined hash + local key densify), and residual `extra` predicates.
    Falls back to gather for range/asof joins and correlated mark-NULL
    tracking (needs a second co-partitioning on different keys)."""
    jt = node.join_type
    if jt not in ("inner", "left", "right", "full", "semi", "anti",
                  "mark"):
        return _exec_gathered(node, ctx)
    if not node.conds or node.range_cond is not None or node.asof:
        return _exec_gathered(node, ctx)
    if jt == "mark" and node.mark_in and len(node.conds) > 1:
        return _exec_gathered(node, ctx)

    ls, lb = _exec(node.left, ctx)
    rs, rb = _exec(node.right, ctx)
    n_shards = ctx.n
    lcap_per = lb.capacity // n_shards
    rcap_per = rb.capacity // n_shards
    ex_cap = bucket_capacity(max(lcap_per, rcap_per, 128) * 2
                             // max(n_shards // 2, 1))
    ex_cap = max(ex_cap, 256)
    out_cap = bucket_capacity(max(lcap_per * 2, 256))

    lflat, _ = _flatten_batch(lb)
    rflat, _ = _flatten_batch(rb)
    for attempt in range(5):
        outs = _join_attempt(node, ctx, lb, rb, lflat, rflat,
                             ex_cap, out_cap)
        overflow = int(jnp.sum(outs[-1]))
        if overflow == 0:
            break
        # skew/expansion backstop: double capacities and recompile
        # (reference: dynamic radix-bit repartitioning,
        # join_hashtable.hpp:375-428)
        ex_cap *= 2
        out_cap *= 4
    else:
        raise RuntimeError("join exchange overflow after retries")

    arrays = [o.reshape(-1) for o in outs[:-1]]
    sel = arrays[-1]
    arrays = arrays[:-1]
    cols = []
    i = 0
    nsrc = len(node.schema.fields)
    for k in range(nsrc):
        d = arrays[i]
        i += 1
        nn = arrays[i] != 0
        i += 1
        cols.append(Column(d, nn if bool(jnp.any(nn)) else None))
    return node.schema, Batch(tuple(cols), sel,
                              sel.astype(jnp.int32).sum())


def _join_attempt(node: L.Join, ctx: DistContext, lb, rb, lflat, rflat,
                  ex_cap: int, out_cap: int):
    jt = node.join_type
    n_shards = ctx.n
    from ..ops import hashing

    def kern(*arrs):
        lb2, _ = _unflatten_batch(arrs[:_flat_len(lb)], lb)
        rb2, _ = _unflatten_batch(arrs[_flat_len(lb):], rb)
        lks, lns, rks, rns = [], [], [], []
        for c in node.conds:
            ld, ln = evaluate(c.left, lb2)
            rd, rn = evaluate(c.right, rb2)
            lks.append(physical._joinable_int64(ld, c.left.dtype))
            rks.append(physical._joinable_int64(rd, c.right.dtype))
            lns.append(ln)
            rns.append(rn)

        def pid_of(keys):
            h = jnp.zeros(keys[0].shape[0], dtype=jnp.uint64)
            for k in keys:
                h = hashing.hash_combine(h, k)
            return (h >> jnp.uint64(33)).astype(jnp.int32) % n_shards

        def nullflags(ns, cap):
            return [(x if x is not None else jnp.zeros(cap, bool))
                    .astype(jnp.int8) for x in ns]

        # exchange with valid = sel (NOT live): rows with NULL keys must
        # survive for outer/anti/mark semantics; they carry their null
        # flags and simply never match locally
        from .exchange import all_to_all_exchange
        lpack = lks + nullflags(lns, lb2.sel.shape[0]) \
            + _batch_arrays(lb2)
        rpack = rks + nullflags(rns, rb2.sel.shape[0]) \
            + _batch_arrays(rb2)
        el, elsel, lof = all_to_all_exchange(
            lpack, lb2.sel, pid_of(lks), n_shards, ex_cap)
        er, ersel, rof = all_to_all_exchange(
            rpack, rb2.sel, pid_of(rks), n_shards, ex_cap)
        nc = len(node.conds)
        elks, elns = list(el[:nc]), [x != 0 for x in el[nc:2 * nc]]
        elrest = list(el[2 * nc:])
        erks, erns = list(er[:nc]), [x != 0 for x in er[nc:2 * nc]]
        errest = list(er[2 * nc:])

        l_live = elsel
        for x in elns:
            l_live = l_live & ~x
        r_live = ersel
        for x in erns:
            r_live = r_live & ~x
        if nc == 1:
            lk2, rk2 = elks[0], erks[0]
        else:
            lk2, rk2 = physical._densify_keys(elks, l_live, erks,
                                              r_live)
            l_live = l_live & (lk2 >= 0)
            r_live = r_live & (rk2 >= 0)

        bt = join_ops.build(rk2, None, r_live)
        lo, cnt = join_ops.probe_ranges(bt, lk2, None, l_live)
        cap_l = elsel.shape[0]
        cap_r = ersel.shape[0]
        overflow = (lof + rof).astype(jnp.int64)

        if jt in ("semi", "anti", "mark") and node.extra is None:
            has = cnt > 0
            if jt == "mark":
                if node.mark_in:
                    # global build facts for SQL 3-valued IN marks
                    in_null = erns[0] if erns else jnp.zeros(cap_r, bool)
                    hasnull = lax.psum(
                        (ersel & in_null).astype(jnp.int32).sum(), AXIS)
                    nonempty = lax.psum(
                        ersel.astype(jnp.int32).sum(), AXIS)
                    pnull = elns[0] if elns else jnp.zeros(cap_l, bool)
                    mnull = ~has & ((pnull & (nonempty > 0))
                                    | (hasnull > 0))
                else:
                    mnull = jnp.zeros(cap_l, bool)
                outs = elrest + [has, mnull.astype(jnp.int8), elsel]
                return tuple(x[None] for x in outs) + (overflow[None],)
            m = elsel & (has if jt == "semi" else ~has)
            outs = elrest + [m]
            return tuple(x[None] for x in outs) + (overflow[None],)

        total = cnt.astype(jnp.int64).sum()
        overflow = overflow + jnp.maximum(total - out_cap, 0)
        pi, bpos, valid = join_ops.expand(lo, cnt, out_cap)
        brow = bt.srow[bpos]

        if node.extra is not None:
            # residual predicate over expanded pairs (reference:
            # non-equality conditions in ScanStructure::Next)
            pair_cols = []
            i = 0
            for c in lb.columns:
                d = elrest[i][pi]
                i += 1
                nn = elrest[i][pi] != 0
                i += 1
                pair_cols.append(Column(d, nn))
            i = 0
            for c in rb.columns:
                d = errest[i][brow]
                i += 1
                nn = errest[i][brow] != 0
                i += 1
                pair_cols.append(Column(d, nn))
            pairs = Batch(tuple(pair_cols), valid,
                          valid.astype(jnp.int32).sum())
            valid = valid & select_mask(node.extra, pairs)
            if jt in ("semi", "anti", "mark"):
                tgt = jnp.where(valid, pi, cap_l)
                matched = jnp.zeros(cap_l + 1, jnp.int32) \
                    .at[tgt].max(1, mode="drop")[:cap_l] > 0
                if jt == "mark":
                    outs = elrest + [matched,
                                     jnp.zeros(cap_l, jnp.int8), elsel]
                    return tuple(x[None] for x in outs) \
                        + (overflow[None],)
                m = elsel & (matched if jt == "semi" else ~matched)
                outs = elrest + [m]
                return tuple(x[None] for x in outs) + (overflow[None],)
            p_t = jnp.where(valid, pi, cap_l)
            probe_matched = jnp.zeros(cap_l + 1, jnp.int32) \
                .at[p_t].max(1, mode="drop")[:cap_l] > 0
            b_t = jnp.where(valid, brow, cap_r)
            build_matched = jnp.zeros(cap_r + 1, jnp.int32) \
                .at[b_t].max(1, mode="drop")[:cap_r] > 0
        else:
            probe_matched = cnt > 0
            build_matched = join_ops.matched_build_mask(bt, lo, cnt,
                                                        cap_r)

        ext_l = cap_l if jt in ("left", "full") else 0
        ext_r = cap_r if jt in ("right", "full") else 0

        lo_valid = elsel & ~probe_matched if ext_l else None
        ro_valid = ersel & ~build_matched if ext_r else None

        outs = []
        # left columns: [matches][left-outer][right-outer(null)]
        i = 0
        for c in lb.columns:
            parts_d = [elrest[i][pi]]
            parts_n = [(elrest[i + 1][pi] != 0) | ~valid]
            if ext_l:
                parts_d.append(elrest[i])
                parts_n.append(elrest[i + 1] != 0)
            if ext_r:
                parts_d.append(jnp.zeros(cap_r, elrest[i].dtype))
                parts_n.append(jnp.ones(cap_r, bool))
            outs.append(jnp.concatenate(parts_d))
            outs.append(jnp.concatenate(parts_n).astype(jnp.int8))
            i += 2
        i = 0
        for c in rb.columns:
            parts_d = [errest[i][brow]]
            parts_n = [(errest[i + 1][brow] != 0) | ~valid]
            if ext_l:
                parts_d.append(jnp.zeros(cap_l, errest[i].dtype))
                parts_n.append(jnp.ones(cap_l, bool))
            if ext_r:
                parts_d.append(errest[i])
                parts_n.append(errest[i + 1] != 0)
            outs.append(jnp.concatenate(parts_d))
            outs.append(jnp.concatenate(parts_n).astype(jnp.int8))
            i += 2
        sel_parts = [valid]
        if ext_l:
            sel_parts.append(lo_valid)
        if ext_r:
            sel_parts.append(ro_valid)
        outs.append(jnp.concatenate(sel_parts))
        return tuple(x[None] for x in outs) + (overflow[None],)

    fn = shard_map(kern, mesh=ctx.mesh,
                   in_specs=tuple(P(AXIS) for _ in (lflat + rflat)),
                   out_specs=P(AXIS))
    return jax.jit(fn)(*(lflat + rflat))


# ---------------------------------------------------------------------------
# distributed sort (sample-based range partition + local sort)
# ---------------------------------------------------------------------------

def _exec_order(node: L.Order, ctx: DistContext):
    """Distributed ORDER BY: sample the first sort key to pick range
    boundaries (identical on every shard via all_gather), route rows to
    their range owner over ICI, then one local carry-everything sort per
    shard.  Rows with equal first-key values are co-located, so the
    shard-major concatenation is globally sorted (the parallel analog of
    the reference's sorted-run merge, common/sorting/sorted_run_merger.hpp)."""
    schema, b = _exec(node.child, ctx)
    n_shards = ctx.n
    cap_per = max(b.capacity // n_shards, 1)
    ex_cap = bucket_capacity(max(cap_per * 2, 256))
    flat, _ = _flatten_batch(b)
    for attempt in range(5):
        outs = _order_attempt(node, ctx, b, flat, ex_cap)
        overflow = int(jnp.sum(outs[-1]))
        if overflow == 0:
            break
        ex_cap *= 2   # range skew backstop: double and recompile
    else:
        raise RuntimeError("order exchange overflow after retries")
    arrays = [o.reshape(-1) for o in outs[:-1]]
    sel = arrays[-1]
    cols = []
    i = 0
    for c in b.columns:
        d = arrays[i]
        i += 1
        nn = arrays[i] != 0
        i += 1
        cols.append(Column(d, nn if bool(jnp.any(nn)) else None))
    return node.schema, Batch(tuple(cols), sel,
                              sel.astype(jnp.int32).sum())


def _order_attempt(node: L.Order, ctx: DistContext, b, flat,
                   ex_cap: int):
    n_shards = ctx.n
    n_samples = 64

    def kern(*arrs):
        bb, _ = _unflatten_batch(arrs, b)
        n_local = bb.sel.shape[0]
        key_ops = []
        for k in node.keys:
            d, nmask = evaluate(k.expr, bb)
            key_ops.extend(sortkey.encode_key(
                d, nmask, k.expr.dtype, desc=k.desc,
                nulls_last=k.nulls_last))
        k0 = node.keys[0]
        d0, n0 = evaluate(k0.expr, bb)
        pops = sortkey.encode_key(d0, n0, k0.expr.dtype, desc=k0.desc,
                                  nulls_last=k0.nulls_last)
        p0 = pops[0].astype(jnp.int64)
        p1 = (pops[1].astype(jnp.int64) if len(pops) > 1
              else jnp.zeros(n_local, jnp.int64))
        big = jnp.iinfo(jnp.int64).max
        live = bb.sel
        s0, s1 = lax.sort([jnp.where(live, p0, big),
                           jnp.where(live, p1, big)], num_keys=2)
        stride = max(n_local // n_samples, 1)
        samp0 = s0[::stride][:n_samples]
        samp1 = s1[::stride][:n_samples]
        g0 = lax.all_gather(samp0, AXIS).reshape(-1)
        g1 = lax.all_gather(samp1, AXIS).reshape(-1)
        gs0, gs1 = lax.sort([g0, g1], num_keys=2)
        total = g0.shape[0]
        bidx = (jnp.arange(1, n_shards) * total) // n_shards
        b0 = gs0[bidx]
        b1 = gs1[bidx]
        # shard = #boundaries strictly below the row's (p0, p1): equal
        # first-key rows land on one shard, making ties local
        ge = (p0[:, None] > b0[None, :]) \
            | ((p0[:, None] == b0[None, :]) & (p1[:, None] >= b1[None, :]))
        pid = ge.astype(jnp.int32).sum(axis=1)

        from .exchange import all_to_all_exchange
        pack = list(key_ops) + _batch_arrays(bb)
        ex, exsel, ov = all_to_all_exchange(pack, bb.sel, pid, n_shards,
                                            ex_cap)
        nko = len(key_ops)
        eops = list(ex[:nko])
        erest = list(ex[nko:])
        invalid = (~exsel).astype(jnp.int32)
        out = lax.sort([invalid, *eops, *erest], num_keys=1 + nko,
                       is_stable=True)
        sel2 = out[0] == 0
        rest = out[1 + nko:]
        outs = list(rest) + [sel2]
        return tuple(x[None] for x in outs) \
            + (ov.astype(jnp.int64)[None],)

    fn = shard_map(kern, mesh=ctx.mesh,
                   in_specs=tuple(P(AXIS) for _ in flat),
                   out_specs=P(AXIS))
    return jax.jit(fn)(*flat)


def _exec_distinct(node: L.Distinct, ctx: DistContext):
    """DISTINCT = grouped aggregate over every column with no payloads
    (reference: distinct lowers to aggregate, physical_plan_generator)."""
    groups = [ir.ColRef(i, f.dtype, f.name, f.strdict)
              for i, f in enumerate(node.child.schema.fields)]
    agg = L.Aggregate(node.child, groups, [],
                      list(node.child.schema.names), node.schema)
    return _exec_aggregate(agg, ctx)


# ---------------------------------------------------------------------------
# batch <-> flat array plumbing (shard_map wants plain array args)
# ---------------------------------------------------------------------------

def _flatten_batch(b: Batch):
    flat = []
    layout = []
    for c in b.columns:
        flat.append(c.data)
        flat.append((c.nulls if c.nulls is not None
                     else jnp.zeros(b.capacity, bool)).astype(jnp.int8))
        layout.append(c.nulls is not None)
    flat.append(b.sel)
    return flat, layout


def _flat_len(b: Batch) -> int:
    return len(b.columns) * 2 + 1


def _unflatten_batch(arrs, proto: Batch):
    cols = []
    i = 0
    for c in proto.columns:
        d = arrs[i].reshape(-1)
        i += 1
        nn = arrs[i].reshape(-1) != 0
        i += 1
        cols.append(Column(d, nn if c.nulls is not None else None))
    sel = arrs[i].reshape(-1)
    b = Batch(tuple(cols), sel, sel.astype(jnp.int32).sum())
    return b, None


def _batch_arrays(b: Batch) -> List:
    out = []
    for c in b.columns:
        out.append(c.data)
        out.append((c.nulls if c.nulls is not None
                    else jnp.zeros(b.capacity, bool)).astype(jnp.int8))
    return out
