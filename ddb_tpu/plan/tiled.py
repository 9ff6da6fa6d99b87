"""Out-of-core tiled execution: host↔HBM streaming aggregation.

The TPU analog of the reference's external (spilling) operator modes
(reference: radix_partitioned_hashtable.cpp abandon-HT external mode,
storage/temporary_memory_manager.hpp arbitration): when a base table
exceeds `external_threshold_rows`, aggregation pipelines stream the table
through HBM in fixed-size row tiles:

  per tile (ONE compiled kernel, reused — all tiles pad to one shape):
      scan tile -> filters/projections -> PARTIAL aggregate -> compact
  combine:  concatenate partial groups on host (small) ->
            merge aggregate (sum/min/max of partials, avg = Σsum/Σcount)
  finish:   run the plan above the Aggregate over the merged result

Only decomposable aggregates stream (sum/count/min/max/avg — the same
set the distributed executor exchanges, parallel/executor.py); plans
with holistic aggregates (quantile/distinct) fall back to in-memory.
Device transfers overlap compute via XLA async dispatch (the tile k+1
upload is enqueued while tile k executes).
"""

from __future__ import annotations

import copy
from typing import List, Optional, Tuple

import numpy as np

from .. import types as T
from ..batch import Batch, Schema, bucket_capacity, make_batch
from ..expr import ir
from ..types import TypeId
from . import logical as L
from . import physical

MERGEABLE = {"sum", "min", "max", "count", "count_star", "avg"}

_UPPER = (L.Project, L.Order, L.Limit, L.Filter, L.Distinct)
_LOWER = (L.Filter, L.Project)


def _max_get_rows(node: L.LogicalNode) -> int:
    """Largest base-table row count anywhere under `node`."""
    if isinstance(node, L.Get):
        return node.table.num_rows
    best = 0
    for attr in ("child", "left", "right", "base", "recursive"):
        ch = getattr(node, attr, None)
        if isinstance(ch, L.LogicalNode):
            best = max(best, _max_get_rows(ch))
    return best


# join types whose probe rows aggregate independently per tile (build-side
# unmatched rows of RIGHT/FULL joins would double-count across tiles)
_STREAM_JOINS = ("inner", "left", "semi", "anti")


def find_tiled_pipeline(plan: L.LogicalNode, threshold: int):
    """Locate upper* -> Aggregate -> (Filter|Project|Join)* -> Get(big).

    Joins stream when the BIG table feeds the probe (left) side and the
    build side is small: each probe tile joins against the full build
    input independently (reference: the external mode of
    radix_partitioned_hashtable.cpp keeps the build resident and spills
    probe partitions similarly).  Returns (upper, agg, lower, get)."""
    upper: List[L.LogicalNode] = []
    node = plan
    while isinstance(node, _UPPER):
        upper.append(node)
        node = node.child
    if not isinstance(node, L.Aggregate):
        return None
    agg = node
    for a in agg.aggs:
        if a.kind not in MERGEABLE or a.distinct:
            return None
    lower: List[L.LogicalNode] = []
    node = agg.child
    while True:
        if isinstance(node, _LOWER):
            lower.append(node)
            node = node.child
            continue
        if isinstance(node, L.Join) \
                and node.join_type in _STREAM_JOINS \
                and not getattr(node, "asof", False) \
                and _max_get_rows(node.left) > threshold \
                and _max_get_rows(node.right) <= threshold:
            lower.append(node)
            node = node.left
            continue
        break
    if not isinstance(node, L.Get):
        return None
    if node.table.num_rows <= threshold:
        return None
    return upper, agg, lower, node


def _partial_specs(agg: L.Aggregate):
    """Decompose aggregates into mergeable partials.

    Returns (partial_specs, merge_specs, final_exprs) where final_exprs
    reproduce the ORIGINAL agg output columns (positions after groups)
    from the merge-aggregate output."""
    ng = len(agg.groups)
    partials: List[L.AggSpec] = []
    merges: List[L.AggSpec] = []
    finals: List[ir.Expr] = []

    def add(kind, arg, dtype, merge_kind):
        i = len(partials)
        partials.append(L.AggSpec(kind, arg, dtype, f"__p{i}"))
        mref = ir.ColRef(ng + i, dtype, f"__p{i}",
                         getattr(arg, "strdict", None)
                         if kind in ("min", "max") else None)
        merges.append(L.AggSpec(merge_kind, mref, dtype, f"__m{i}"))
        return ng + i    # column position in the merge-agg output

    for a in agg.aggs:
        if a.kind == "count_star":
            pos = add("count_star", None, T.BIGINT, "sum")
            finals.append(ir.ColRef(pos, T.BIGINT, a.name))
        elif a.kind == "count":
            pos = add("count", a.arg, T.BIGINT, "sum")
            finals.append(ir.ColRef(pos, T.BIGINT, a.name))
        elif a.kind in ("sum", "min", "max"):
            mk = a.kind if a.kind in ("min", "max") else "sum"
            pos = add(a.kind, a.arg, a.dtype, mk)
            ref = ir.ColRef(pos, a.dtype, a.name)
            ref.strdict = getattr(a.arg, "strdict", None) \
                if a.kind in ("min", "max") else None
            finals.append(ref)
        elif a.kind == "avg":
            at = a.arg.dtype
            if at.id == TypeId.DECIMAL:
                sdt = T.DECIMAL(18, at.scale)
            elif at.is_integer:
                sdt = T.HUGEINT
            else:
                sdt = T.DOUBLE
            spos = add("sum", a.arg, sdt, "sum")
            cpos = add("count", a.arg, T.BIGINT, "sum")
            s = ir.promote(ir.ColRef(spos, sdt, "__s"), T.DOUBLE)
            c = ir.promote(ir.ColRef(cpos, T.BIGINT, "__c"), T.DOUBLE)
            e = ir.Arith("/", s, c, T.DOUBLE)
            if at.id == TypeId.DECIMAL:
                e = ir.Arith("/", e,
                             ir.Const(float(T.decimal_scale_factor(
                                 at.scale)), T.DOUBLE), T.DOUBLE)
            finals.append(e)
        else:                                    # pragma: no cover
            raise AssertionError(a.kind)
    return partials, merges, finals


class _TiledPlan:
    """Compiled-once artifacts for a tiled aggregation pipeline."""

    def __init__(self, plan, upper, agg, lower, get, tile_rows: int):
        self.get = get
        self.tile_rows = tile_rows
        self.cap = bucket_capacity(tile_rows)

        # tile subplan: Get replaced by a CTERef mailbox
        self.cell = L.CTECell()
        node: L.LogicalNode = L.CTERef("__tile", get.schema, self.cell)
        if get.filters:
            node = L.Filter(node, ir.make_and(get.filters))
        for ln in reversed(lower):
            n2 = copy.copy(ln)
            if isinstance(ln, L.Join):
                n2.left = node      # tile feeds the probe side
            else:
                n2.child = node
            object.__setattr__(n2, "_kern_cache", {})
            node = n2
        partials, merges, finals = _partial_specs(agg)
        self.tile_plan = L.Aggregate(node, agg.groups, partials,
                                     list(agg.group_names))

        # merge plan over the concatenated partials
        self.merge_cell = L.CTECell()
        pschema = self.tile_plan.schema
        merge_ref = L.CTERef("__partials", pschema, self.merge_cell)
        ng = len(agg.groups)
        groups2 = [ir.ColRef(i, f.dtype, f.name, f.strdict)
                   for i, f in enumerate(pschema.fields[:ng])]
        merge_agg = L.Aggregate(merge_ref, groups2, merges,
                                list(agg.group_names))
        proj_exprs = [ir.ColRef(i, f.dtype, f.name, f.strdict)
                      for i, f in enumerate(merge_agg.schema.fields[:ng])]
        proj_exprs += finals
        self.merge_plan = L.Project(merge_agg, proj_exprs,
                                    list(agg.schema.names), agg.schema)

        # plan above the aggregate, fed from a mailbox with agg's schema
        self.final_cell = L.CTECell()
        node = L.CTERef("__agged", agg.schema, self.final_cell)
        for un in reversed(upper):
            n2 = copy.copy(un)
            n2.child = node
            object.__setattr__(n2, "_kern_cache", {})
            node = n2
        self.upper_plan = node


def execute_tiled(plan: L.LogicalNode, config) -> Optional[
        Tuple[Schema, Batch]]:
    """Execute `plan` out-of-core if it matches a tiled shape; None if
    the plan is not tileable (caller falls back to in-memory)."""
    threshold = int(config.get("external_threshold_rows"))
    found = find_tiled_pipeline(plan, threshold)
    if found is None:
        return None
    upper, agg, lower, get = found
    tp = getattr(plan, "_tiled_plan", None)
    if tp is None or tp.get is not get:
        tp = _TiledPlan(plan, upper, agg, lower, get,
                        int(config.get("tile_rows")))
        plan._tiled_plan = tp

    table = get.table
    n = table.num_rows
    cols = [table.columns[i] for i in get.column_indices]

    part_data: List[List[np.ndarray]] = None
    part_nulls: List[List[Optional[np.ndarray]]] = None
    for lo in range(0, n, tp.tile_rows):
        hi = min(lo + tp.tile_rows, n)
        arrays = [c.data[lo:hi] for c in cols]
        nulls = [c.nulls[lo:hi] if c.nulls is not None else None
                 for c in cols]
        tp.cell.batch = make_batch(arrays, nulls, count=hi - lo,
                                   capacity=tp.cap)
        schema, pbatch = physical.execute(tp.tile_plan)
        data, masks = _to_host(pbatch)
        if part_data is None:
            part_data = [[d] for d in data]
            part_nulls = [[m] for m in masks]
        else:
            for i, d in enumerate(data):
                part_data[i].append(d)
                part_nulls[i].append(masks[i])
    tp.cell.batch = None

    # combine partials -> merge aggregate -> original upper plan
    comb_data = [np.concatenate(ds) for ds in part_data]
    comb_nulls = []
    for ds, ms in zip(part_data, part_nulls):
        if any(m is not None for m in ms):
            comb_nulls.append(np.concatenate(
                [m if m is not None else np.zeros(len(d), dtype=bool)
                 for d, m in zip(ds, ms)]))
        else:
            comb_nulls.append(None)
    total = len(comb_data[0]) if comb_data else 0
    tp.merge_cell.batch = make_batch(comb_data, comb_nulls, count=total)
    mschema, mbatch = physical.execute(tp.merge_plan)
    tp.merge_cell.batch = None

    tp.final_cell.batch = mbatch
    schema, batch = physical.execute(tp.upper_plan)
    tp.final_cell.batch = None
    return schema, batch


def _to_host(batch: Batch):
    """Pull live rows of a (small, compacted) partial batch to host."""
    sel = np.asarray(batch.sel)
    data, nulls = [], []
    for c in batch.columns:
        data.append(np.asarray(c.data)[sel])
        nulls.append(np.asarray(c.nulls)[sel]
                     if c.nulls is not None else None)
    return data, nulls


# ---------------------------------------------------------------------------
# out-of-core TopN: Limit -> Order -> (Filter|Project)* -> Get(big)
# (reference: external sort, src/common/sort/ + physical_top_n.cpp keeps a
# bounded heap; the TPU shape is per-tile TopN kernels then a final TopN
# over <= tiles*k candidate rows)
# ---------------------------------------------------------------------------

def find_tiled_topn(plan: L.LogicalNode, threshold: int):
    node = plan
    if not isinstance(node, L.Limit) or node.limit is None:
        return None
    limit = node
    node = node.child
    if not isinstance(node, L.Order):
        return None
    order = node
    lower: List[L.LogicalNode] = []
    node = order.child
    while isinstance(node, _LOWER):
        lower.append(node)
        node = node.child
    if not isinstance(node, L.Get):
        return None
    if node.table.num_rows <= threshold:
        return None
    k = limit.limit + limit.offset
    if k >= node.table.num_rows:
        return None
    return limit, order, lower, node, k


class _TiledTopN:
    """Compiled-once artifacts for a tiled TopN pipeline."""

    def __init__(self, limit: L.Limit, order: L.Order, lower, get,
                 tile_rows: int, k: int):
        self.get = get
        self.tile_rows = tile_rows
        self.cap = bucket_capacity(tile_rows)

        self.cell = L.CTECell()
        node: L.LogicalNode = L.CTERef("__tile", get.schema, self.cell)
        if get.filters:
            node = L.Filter(node, ir.make_and(get.filters))
        for ln in reversed(lower):
            n2 = copy.copy(ln)
            n2.child = node
            object.__setattr__(n2, "_kern_cache", {})
            node = n2
        # per-tile candidates: top (limit+offset) under the same keys
        self.tile_plan = L.Limit(L.Order(node, order.keys), k, 0)
        self.row_schema = self.tile_plan.schema

        # final TopN over the concatenated candidates
        self.final_cell = L.CTECell()
        fnode: L.LogicalNode = L.CTERef("__cands", self.row_schema,
                                        self.final_cell)
        self.final_plan = L.Limit(L.Order(fnode, order.keys),
                                  limit.limit, limit.offset)


def execute_tiled_topn(plan: L.LogicalNode, config) -> Optional[
        Tuple[Schema, Batch]]:
    threshold = int(config.get("external_threshold_rows"))
    found = find_tiled_topn(plan, threshold)
    if found is None:
        return None
    limit, order, lower, get, k = found
    tp = getattr(plan, "_tiled_topn", None)
    if tp is None or tp.get is not get:
        tp = _TiledTopN(limit, order, lower, get,
                        int(config.get("tile_rows")), k)
        plan._tiled_topn = tp

    table = get.table
    n = table.num_rows
    cols = [table.columns[i] for i in get.column_indices]
    cand_data: List[List[np.ndarray]] = None
    cand_nulls: List[List[Optional[np.ndarray]]] = None
    for lo in range(0, n, tp.tile_rows):
        hi = min(lo + tp.tile_rows, n)
        arrays = [c.data[lo:hi] for c in cols]
        nulls = [c.nulls[lo:hi] if c.nulls is not None else None
                 for c in cols]
        tp.cell.batch = make_batch(arrays, nulls, count=hi - lo,
                                   capacity=tp.cap)
        _, cbatch = physical.execute(tp.tile_plan)
        data, masks = _to_host(cbatch)
        if cand_data is None:
            cand_data = [[d] for d in data]
            cand_nulls = [[m] for m in masks]
        else:
            for i, d in enumerate(data):
                cand_data[i].append(d)
                cand_nulls[i].append(masks[i])
    tp.cell.batch = None

    comb_data = [np.concatenate(ds) for ds in cand_data]
    comb_nulls = []
    for ds, ms in zip(cand_data, cand_nulls):
        if any(m is not None for m in ms):
            comb_nulls.append(np.concatenate(
                [m if m is not None else np.zeros(len(d), dtype=bool)
                 for d, m in zip(ds, ms)]))
        else:
            comb_nulls.append(None)
    total = len(comb_data[0]) if comb_data else 0
    tp.final_cell.batch = make_batch(comb_data, comb_nulls, count=total)
    schema, batch = physical.execute(tp.final_plan)
    tp.final_cell.batch = None
    return schema, batch


# ---------------------------------------------------------------------------
# external full sort (reference: sorted-run spill + k-way merge,
# src/common/sorting/sorted_run.cpp + sorted_run_merger.hpp:22)
# ---------------------------------------------------------------------------

def find_tiled_sort(plan: L.LogicalNode, threshold: int):
    """Match [Project]* Order [Filter/Project]* Get over a big table."""
    upper: List[L.LogicalNode] = []
    node = plan
    while isinstance(node, L.Project):
        upper.append(node)
        node = node.child
    if not isinstance(node, L.Order):
        return None
    order = node
    lower: List[L.LogicalNode] = []
    node = order.child
    while isinstance(node, _LOWER):
        lower.append(node)
        node = node.child
    if not isinstance(node, L.Get):
        return None
    if node.table.num_rows <= threshold:
        return None
    return upper, order, lower, node


def _np_orderable(d: np.ndarray, dtype) -> np.ndarray:
    """Host port of ops/sortkey._orderable (same total order)."""
    if d.dtype == np.float32:
        bits = d.view(np.int32)
        return np.where(bits < 0, bits ^ np.int32(2**31 - 1), bits)
    if d.dtype == np.float64:
        bits = d.view(np.int64)
        return np.where(bits < 0, bits ^ np.int64(2**63 - 1), bits)
    if d.dtype == np.bool_:
        return d.astype(np.int32)
    return d


def _host_sort_perm(keys, order: L.Order) -> np.ndarray:
    """Stable permutation sorting host key columns per the ORDER BY spec
    (the merge phase of the external sort: device produced the runs,
    the host — our spill tier — merges)."""
    ops = []
    for (d, nmask), k in zip(keys, order.keys):
        v = _np_orderable(np.asarray(d), k.expr.dtype)
        if k.desc:
            v = ~v if v.dtype.kind in "iu" else -v
        if nmask is not None:
            nullkey = np.where(nmask,
                               np.int32(1 if k.nulls_last else 0),
                               np.int32(0 if k.nulls_last else 1))
            v = np.where(nmask, np.zeros_like(v), v)
            ops.append(nullkey)
            ops.append(v)
        else:
            ops.append(v)
    return np.lexsort(tuple(reversed(ops)))


class _TiledSort:
    """Compiled-once artifacts for an external full sort."""

    def __init__(self, upper, order: L.Order, lower, get,
                 tile_rows: int):
        self.get = get
        self.order = order
        self.tile_rows = tile_rows
        self.cap = bucket_capacity(tile_rows)

        # per-tile plan: lower ops + a projection emitting the ORDER BY
        # key columns FOLLOWED by every payload column
        self.cell = L.CTECell()
        node: L.LogicalNode = L.CTERef("__tile", get.schema, self.cell)
        if get.filters:
            node = L.Filter(node, ir.make_and(get.filters))
        for ln in reversed(lower):
            n2 = copy.copy(ln)
            n2.child = node
            object.__setattr__(n2, "_kern_cache", {})
            node = n2
        base = node.schema
        key_exprs = [k.expr for k in order.keys]
        pay_exprs = [ir.ColRef(i, f.dtype, f.name, f.strdict)
                     for i, f in enumerate(base.fields)]
        names = [f"__k{i}" for i in range(len(key_exprs))] \
            + list(base.names)
        self.nkeys = len(key_exprs)
        self.tile_plan = L.Project(node, key_exprs + pay_exprs, names)
        self.out_schema = base

        # upper projections re-run tile-wise over the sorted rows
        self.final_cell = L.CTECell()
        fnode: L.LogicalNode = L.CTERef("__sorted", base,
                                        self.final_cell)
        for un in reversed(upper):
            n2 = copy.copy(un)
            n2.child = fnode
            object.__setattr__(n2, "_kern_cache", {})
            fnode = n2
        self.final_plan = fnode


def execute_tiled_sort(plan: L.LogicalNode, config) -> Optional[
        Tuple[Schema, Batch]]:
    """Out-of-core ORDER BY: device scans/filters tiles and emits key +
    payload columns; the host holds the runs and merges (np.lexsort over
    the encoded keys); upper projections re-run tile-wise.  The full
    table never materializes in device memory."""
    threshold = int(config.get("external_threshold_rows"))
    found = find_tiled_sort(plan, threshold)
    if found is None:
        return None
    upper, order, lower, get = found
    tp = getattr(plan, "_tiled_sort", None)
    if tp is None or tp.get is not get:
        tp = _TiledSort(upper, order, lower, get,
                        int(config.get("tile_rows")))
        plan._tiled_sort = tp

    table = get.table
    n = table.num_rows
    cols = [table.columns[i] for i in get.column_indices]
    runs_data: List[List[np.ndarray]] = None
    runs_nulls: List[List[Optional[np.ndarray]]] = None
    for lo in range(0, n, tp.tile_rows):
        hi = min(lo + tp.tile_rows, n)
        arrays = [c.data[lo:hi] for c in cols]
        nulls = [c.nulls[lo:hi] if c.nulls is not None else None
                 for c in cols]
        tp.cell.batch = make_batch(arrays, nulls, count=hi - lo,
                                   capacity=tp.cap)
        _, tbatch = physical.execute(tp.tile_plan)
        data, masks = _to_host(tbatch)
        if runs_data is None:
            runs_data = [[d] for d in data]
            runs_nulls = [[m] for m in masks]
        else:
            for i, d in enumerate(data):
                runs_data[i].append(d)
                runs_nulls[i].append(masks[i])
    tp.cell.batch = None
    if runs_data is None:
        return None

    comb = [np.concatenate(ds) for ds in runs_data]
    combn = []
    for ds, ms in zip(runs_data, runs_nulls):
        if any(m is not None for m in ms):
            combn.append(np.concatenate(
                [m if m is not None else np.zeros(len(d), dtype=bool)
                 for d, m in zip(ds, ms)]))
        else:
            combn.append(None)
    nk = tp.nkeys
    perm = _host_sort_perm(list(zip(comb[:nk], combn[:nk])), tp.order)
    sorted_data = [d[perm] for d in comb[nk:]]
    sorted_nulls = [m[perm] if m is not None else None
                    for m in combn[nk:]]
    total = len(perm)

    if not upper:
        from ..batch import Column
        cols_out = tuple(Column(d, m)
                         for d, m in zip(sorted_data, sorted_nulls))
        sel = np.ones(total, dtype=bool)
        return tp.out_schema, Batch(cols_out, sel, total)

    # upper projections tile-wise (keeps device residency bounded)
    out_data: List[List[np.ndarray]] = None
    out_nulls: List[List[Optional[np.ndarray]]] = None
    fschema = tp.final_plan.schema
    for lo in range(0, total, tp.tile_rows):
        hi = min(lo + tp.tile_rows, total)
        tp.final_cell.batch = make_batch(
            [d[lo:hi] for d in sorted_data],
            [m[lo:hi] if m is not None else None for m in sorted_nulls],
            count=hi - lo, capacity=tp.cap)
        _, fb = physical.execute(tp.final_plan)
        data, masks = _to_host(fb)
        if out_data is None:
            out_data = [[d] for d in data]
            out_nulls = [[m] for m in masks]
        else:
            for i, d in enumerate(data):
                out_data[i].append(d)
                out_nulls[i].append(masks[i])
    tp.final_cell.batch = None
    from ..batch import Column
    if out_data is None:
        # zero result rows: no tile ever ran the final projection
        cols_out = tuple(
            Column(np.zeros(0, dtype=f.dtype.np_dtype), None)
            for f in fschema.fields)
        return fschema, Batch(cols_out,
                              np.zeros(0, dtype=bool), 0)
    cols_out = []
    for ds, ms in zip(out_data, out_nulls):
        d = np.concatenate(ds)
        m = None
        if any(x is not None for x in ms):
            m = np.concatenate(
                [x if x is not None else np.zeros(len(dd), dtype=bool)
                 for dd, x in zip(ds, ms)])
        cols_out.append(Column(d, m))
    sel = np.ones(len(cols_out[0].data) if cols_out else 0, dtype=bool)
    return fschema, Batch(tuple(cols_out), sel,
                          len(cols_out[0].data) if cols_out else 0)


# ---------------------------------------------------------------------------
# external (Grace-partitioned) equi-join: when the build side exceeds the
# TemporaryMemoryManager grant (or the external row threshold), both sides
# hash-partition to spill files and partition PAIRS join independently
# through the normal in-memory kernels.
# (reference: JoinHashTable external mode,
# src/execution/join_hashtable.cpp:609-735 radix partitioning +
# temporary_memory_manager.hpp:70 reservation arbitration)
# ---------------------------------------------------------------------------

_EXT_JOIN_TYPES = ("inner", "left", "right", "full", "semi", "anti")
# rough per-row working-set estimate for the build side (key + run index
# + payload slot ids), matching ops/join.py's sorted-build layout
_BUILD_BYTES_PER_ROW = 24

EXTERNAL_JOIN_STATS = {"joins": 0, "partitions": 0}


def _ext_join_eligible(node: L.LogicalNode) -> bool:
    return (isinstance(node, L.Join) and bool(node.conds)
            and node.range_cond is None and not node.asof
            and node.join_type in _EXT_JOIN_TYPES)


def _find_external_join(node: L.LogicalNode, threshold: int):
    """First eligible Join (top-down) whose build (right) side exceeds
    the external row threshold OR the TemporaryMemoryManager budget."""
    from ..storage import tempmem

    if isinstance(node, L.Materialize):
        return None
    if _ext_join_eligible(node):
        rows_r = _max_get_rows(node.right)
        budget = tempmem.MEMORY.budget_bytes
        over_budget = (budget is not None
                       and rows_r * _BUILD_BYTES_PER_ROW > budget
                       * tempmem.TemporaryMemoryManager
                       .MAXIMUM_FREE_MEMORY_RATIO)
        if rows_r > threshold or over_budget:
            return node
    for attr in ("child", "left", "right", "base", "recursive"):
        ch = getattr(node, attr, None)
        if isinstance(ch, L.LogicalNode):
            hit = _find_external_join(ch, threshold)
            if hit is not None:
                return hit
    return None


def _partition_ids(schema, batch, conds, side: str, nparts: int):
    """Host partition ids per capacity slot (-1 = dead row)."""
    import jax.numpy as jnp

    from ..ops import hashing
    from .physical import _key_arrays

    ds, ns = _key_arrays(conds, batch, side)
    h = jnp.zeros(batch.sel.shape[0], dtype=jnp.uint64)
    for d, nm in zip(ds, ns):
        k = d.astype(jnp.int64)
        if nm is not None:
            k = jnp.where(nm, jnp.int64(-1), k)
        h = hashing.hash_combine(h, k)
    pid = (h >> jnp.uint64(33)).astype(jnp.int32) % nparts
    pid = jnp.where(batch.sel, pid, -1)
    return np.asarray(pid)


def execute_external_join(plan: L.LogicalNode, config):
    """If the plan contains an oversized equi-join, execute that join as
    a Grace-partitioned external join (partitions spilled via
    TemporaryFileManager) and run the remaining plan over the spliced
    result.  Returns (schema, batch) or None if nothing qualifies."""
    try:
        threshold = int(config.get("external_threshold_rows"))
    except Exception:
        return None
    if threshold is None or threshold <= 0:
        return None
    node = _find_external_join(plan, threshold)
    if node is None:
        return None

    from ..storage import tempmem

    rows_r = _max_get_rows(node.right)
    est = rows_r * _BUILD_BYTES_PER_ROW
    grant = tempmem.MEMORY.reserve(est)
    try:
        if grant >= est and rows_r <= threshold:
            return None
        if grant > 0:
            nparts = int(np.ceil(est / grant))
        else:
            nparts = 8
        nparts = int(min(max(2, 1 << int(np.ceil(np.log2(
            max(nparts, 2))))), 64))

        lschema, lb = physical.execute(node.left)
        rschema, rb = physical.execute(node.right)
        pid_l = _partition_ids(lschema, lb, node.conds, "left", nparts)
        pid_r = _partition_ids(rschema, rb, node.conds, "right", nparts)

        def host_cols(batch):
            data = [np.asarray(c.data) for c in batch.columns]
            nulls = [np.asarray(c.nulls) if c.nulls is not None else None
                     for c in batch.columns]
            return data, nulls

        ldata, lnulls = host_cols(lb)
        rdata, rnulls = host_cols(rb)

        # spill every partition of both sides, then release the inputs
        tokens = []
        for p in range(nparts):
            li = np.nonzero(pid_l == p)[0]
            ri = np.nonzero(pid_r == p)[0]
            larrs = [d[li] for d in ldata] + \
                [(m[li] if m is not None else None) for m in lnulls]
            rarrs = [d[ri] for d in rdata] + \
                [(m[ri] if m is not None else None) for m in rnulls]
            tokens.append((tempmem.FILES.write(larrs), len(ldata),
                           tempmem.FILES.write(rarrs), len(rdata)))
        del ldata, lnulls, rdata, rnulls, lb, rb

        EXTERNAL_JOIN_STATS["joins"] += 1
        EXTERNAL_JOIN_STATS["partitions"] += nparts

        out_data = None
        out_nulls = None
        for ltok, lw, rtok, rw in tokens:
            lraw = tempmem.FILES.read(ltok)
            rraw = tempmem.FILES.read(rtok)
            tempmem.FILES.delete(ltok)
            tempmem.FILES.delete(rtok)
            nl = len(lraw[0]) if lraw[0] is not None else 0
            nr = len(rraw[0]) if rraw[0] is not None else 0
            if nl == 0 and nr == 0:
                continue
            if nl == 0 and node.join_type in ("inner", "left", "semi",
                                              "anti"):
                continue
            if nr == 0 and node.join_type in ("inner", "semi"):
                continue
            lbp = make_batch(lraw[:lw], lraw[lw:], nl)
            rbp = make_batch(rraw[:rw], rraw[rw:], nr)
            import copy as _copy
            sub = _copy.copy(node)
            sub.left = physical.ConstBatch(lschema, lbp)
            sub.right = physical.ConstBatch(rschema, rbp)
            s2, b2 = physical.execute(sub)
            data, nulls = _to_host(b2)
            if out_data is None:
                out_data = [[d] for d in data]
                out_nulls = [[m] for m in nulls]
            else:
                for i, d in enumerate(data):
                    out_data[i].append(d)
                    out_nulls[i].append(nulls[i])
        if out_data is None:
            # all partitions empty: typed empty result
            zl = [np.zeros(0, f.dtype.np_dtype)
                  for f in node.schema.fields]
            final = make_batch(zl, [None] * len(zl), 0)
        else:
            merged = []
            mnulls = []
            for i, parts in enumerate(out_data):
                merged.append(np.concatenate(parts))
                nn = [m if m is not None
                      else np.zeros(len(parts[j]), bool)
                      for j, m in enumerate(out_nulls[i])]
                cat = np.concatenate(nn)
                mnulls.append(cat if cat.any() else None)
            final = make_batch(merged, mnulls, len(merged[0]))

        spliced = _replace_node(plan, node,
                                physical.ConstBatch(node.schema, final))
        return physical.execute(spliced)
    finally:
        tempmem.MEMORY.release(grant)


def _replace_node(plan: L.LogicalNode, target: L.LogicalNode,
                  replacement: L.LogicalNode) -> L.LogicalNode:
    if plan is target:
        return replacement
    new = copy.copy(plan)
    changed = False
    for attr in ("child", "left", "right", "base", "recursive"):
        ch = getattr(plan, attr, None)
        if isinstance(ch, L.LogicalNode):
            sub = _replace_node(ch, target, replacement)
            if sub is not ch:
                setattr(new, attr, sub)
                changed = True
    return new if changed else plan
