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
    # everything else: gather and run the single-device executor
    return _exec_gathered(node, ctx)


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

    class _Const(L.LogicalNode):
        def __init__(self, schema, batch):
            self.schema = schema
            self.batch = batch

        def children(self):
            return []

    # monkey-node: wrap gathered batches as constant sources
    new = copy.copy(node)
    consts = []
    for attr in ("child", "left", "right"):
        if hasattr(new, attr):
            old = getattr(node, attr)
            for k, kb in gathered:
                if k is old:
                    cn = _Const(k.schema, kb)
                    consts.append(cn)
                    setattr(new, attr, cn)

    def exec_const(n, c):
        return n.schema, n.batch

    physical._EXEC[_Const] = exec_const
    try:
        return physical.execute(new)
    finally:
        physical._EXEC.pop(_Const, None)


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

def _exec_aggregate(node: L.Aggregate, ctx: DistContext):
    schema, b = _exec(node.child, ctx)

    for a in node.aggs:
        kind = a.kind
        if a.distinct and kind != "count_star":
            raise NotImplementedError(
                "distributed DISTINCT aggregates not supported yet")
        if kind not in _DIST_AGG_KINDS and kind != "count_star":
            raise NotImplementedError(
                f"distributed aggregate {kind} not supported yet")

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
    fn = shard_map(kern, mesh=ctx.mesh,
                   in_specs=tuple(P(AXIS) for _ in flat),
                   out_specs=P(AXIS))
    outs = jax.jit(fn)(*flat)
    overflow = int(jnp.sum(outs[-1]))
    if overflow > 0:
        raise RuntimeError(
            f"aggregate exchange overflow ({overflow} rows): raise "
            "exchange capacity (skew)")
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
    if node.join_type not in ("inner", "semi", "anti"):
        return _exec_gathered(node, ctx)
    if len(node.conds) != 1 or node.extra is not None:
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

    cond = node.conds[0]

    def kern(*arrs):
        nl = len(lb.columns) * 2 + 1
        lb2, _ = _unflatten_batch(arrs[:_flat_len(lb)], lb)
        rb2, _ = _unflatten_batch(arrs[_flat_len(lb):], rb)
        ld, ln = evaluate(cond.left, lb2)
        rd, rn = evaluate(cond.right, rb2)
        lk = physical._joinable_int64(ld, cond.left.dtype)
        rk = physical._joinable_int64(rd, cond.right.dtype)
        l_live = lb2.sel if ln is None else (lb2.sel & ~ln)
        r_live = rb2.sel if rn is None else (rb2.sel & ~rn)

        lflat = _batch_arrays(lb2)
        rflat = _batch_arrays(rb2)
        (elk, *elrest), elsel, lof = exchange_by_key(
            lk, [lk] + lflat, l_live, n_shards, ex_cap)
        (erk, *errest), ersel, rof = exchange_by_key(
            rk, [rk] + rflat, r_live, n_shards, ex_cap)

        bt = join_ops.build(erk, None, ersel)
        lo, cnt = join_ops.probe_ranges(bt, elk, None, elsel)
        if node.join_type in ("semi", "anti"):
            has = cnt > 0
            m = elsel & (has if node.join_type == "semi" else ~has)
            outs = [a for a in elrest] + [m]
            return tuple(x[None] for x in outs) + ((lof + rof)[None],)
        pi, bpos, valid = join_ops.expand(lo, cnt, out_cap)
        brow = bt.srow[bpos]
        outs = []
        for a in elrest:
            outs.append(a[pi])
        for a in errest:
            outs.append(a[brow])
        outs.append(valid)
        return tuple(x[None] for x in outs) + ((lof + rof)[None],)

    lflat, _ = _flatten_batch(lb)
    rflat, _ = _flatten_batch(rb)
    fn = shard_map(kern, mesh=ctx.mesh,
                   in_specs=tuple(P(AXIS) for _ in (lflat + rflat)),
                   out_specs=P(AXIS))
    outs = jax.jit(fn)(*(lflat + rflat))
    overflow = int(jnp.sum(outs[-1]))
    if overflow > 0:
        raise RuntimeError(
            f"join exchange overflow ({overflow} rows): raise capacity")
    arrays = [o.reshape(-1) for o in outs[:-1]]
    sel = arrays[-1]
    arrays = arrays[:-1]

    cols = []
    i = 0
    src_cols = list(lb.columns) + (list(rb.columns)
                                   if node.join_type == "inner" else [])
    for c in src_cols:
        d = arrays[i]
        i += 1
        nn = arrays[i] != 0
        i += 1
        cols.append(Column(d, nn if bool(jnp.any(nn)) else None))
    return node.schema, Batch(tuple(cols), sel,
                              sel.astype(jnp.int32).sum())


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
