"""Window function kernels — sort + segmented scans, scatter-free.

TPU-native replacement for the reference's window executor
(reference: src/execution/operator/aggregate/physical_window.cpp,
src/function/window/window_segment_tree.cpp).  Where the reference builds
segment trees per partition, here one multi-operand sort by
(partition keys, order keys) + forward/backward segmented scans compute
every supported function in O(n log n) fully vectorized work; an inverse
sort (by carried row id) restores input order.

Default frame semantics (duckdb): with ORDER BY, aggregates use
RANGE UNBOUNDED PRECEDING .. CURRENT ROW (peer rows share the value at the
END of their peer group); without ORDER BY the whole partition.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from .aggregate import _seg_sum_scan, _seg_minmax_scan, _acc_dtype, _extreme


def _seg_backfill_from_last(boundary_next_rev, v):
    """Propagate the value at the LAST row of each segment backwards.
    boundary_next_rev: boundary mask of the REVERSED sequence."""
    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va)
    f, out = lax.associative_scan(op, (boundary_next_rev, v[::-1]))
    return out[::-1]


class WindowSpec(NamedTuple):
    kind: str              # row_number|rank|dense_rank|sum|min|max|count|
    #                        count_star|avg|first_value|last_value|lag|
    #                        lead|nth_value
    data: Optional[jax.Array]
    nulls: Optional[jax.Array]
    offset: int = 1        # lag/lead offset; nth_value's n
    has_order: bool = True
    whole_partition: bool = False   # force whole-partition frame
    rows_frame: Optional[tuple] = None   # (preceding|None, following|None)
    # RANGE value frame (reference: window_boundaries_state in
    # function/window/window_executor.cpp): value distances over ONE
    # numeric order key
    range_frame: Optional[tuple] = None  # (preceding|None, following|None)
    order_val: Optional[jax.Array] = None      # raw order-key values
    order_val_nulls: Optional[jax.Array] = None
    order_desc: bool = False
    order_nulls_first: bool = False
    order_dtype: object = None
    # GROUPS frame: peer-group distances (reference: WindowBoundary
    # EXPR_PRECEDING_GROUPS, function/window/window_boundaries_state.cpp)
    groups_frame: Optional[tuple] = None
    # frame exclusion: None | "current row" | "group" | "ties"
    # (reference: WindowExcludeMode, window_executor.cpp)
    exclude: Optional[str] = None
    # DISTINCT aggregate over the whole partition (count/sum/avg)
    distinct: bool = False


def compute_windows(part_ops: Sequence[jax.Array],
                    order_ops: Sequence[jax.Array],
                    specs: Sequence[WindowSpec],
                    sel: jax.Array):
    """Returns list[(data, nulls)] per spec, aligned to ORIGINAL row order.
    Rows with sel=False get unspecified values (masked upstream)."""
    cap = sel.shape[0]
    rowid = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    invalid = (~sel).astype(jnp.int32)

    carried = []
    for s in specs:
        if s.data is not None:
            carried.append(s.data)
            if s.nulls is not None:
                carried.append(s.nulls.astype(jnp.int8))
        if s.order_val is not None:
            carried.append(s.order_val)
            carried.append((s.order_val_nulls if s.order_val_nulls
                            is not None else
                            jnp.zeros(cap, bool)).astype(jnp.int8))

    operands = [invalid, *part_ops, *order_ops, rowid, *carried]
    nkeys = 1 + len(part_ops) + len(order_ops)
    sorted_ops = lax.sort(operands, num_keys=nkeys, is_stable=True)
    valid_s = sorted_ops[0] == 0
    parts_s = sorted_ops[1:1 + len(part_ops)]
    orders_s = sorted_ops[1 + len(part_ops):nkeys - 0]
    orders_s = sorted_ops[1 + len(part_ops):nkeys]
    rid_s = sorted_ops[nkeys]
    carried_s = sorted_ops[nkeys + 1:]

    # partition boundaries
    pb = jnp.zeros(cap, dtype=bool).at[0].set(True)
    for k in parts_s:
        pb = pb | jnp.concatenate([jnp.ones(1, dtype=bool),
                                   k[1:] != k[:-1]])
    pb = pb | jnp.concatenate([jnp.ones(1, dtype=bool),
                               valid_s[1:] != valid_s[:-1]])
    # peer boundaries (partition + order keys change)
    ob = pb
    for k in orders_s:
        ob = ob | jnp.concatenate([jnp.ones(1, dtype=bool),
                                   k[1:] != k[:-1]])

    pos = lax.broadcasted_iota(jnp.int64, (cap,), 0)
    part_start = lax.associative_scan(jnp.maximum, jnp.where(pb, pos, 0))
    row_number = (pos - part_start + 1)

    # reversed-sequence boundary masks for backward fills
    def rev_boundary(b):
        # segment last-rows become boundaries of the reversed sequence
        last = jnp.concatenate([b[1:], jnp.ones(1, dtype=bool)])
        return last[::-1]

    pb_rev = rev_boundary(pb)
    ob_rev = rev_boundary(ob)

    results_sorted = []
    ci = 0
    for s in specs:
        data_s = None
        nn_s = None
        oval_s = onn_s = None
        if s.data is not None:
            data_s = carried_s[ci]
            ci += 1
            if s.nulls is not None:
                nn_s = carried_s[ci]
                ci += 1
        if s.order_val is not None:
            oval_s = carried_s[ci]
            ci += 1
            onn_s = carried_s[ci]
            ci += 1
        notnull = valid_s if nn_s is None else (valid_s & (nn_s == 0))

        if s.kind == "row_number":
            results_sorted.append((row_number, None))
            continue
        if s.kind == "rank":
            peer_first = lax.associative_scan(
                jnp.maximum, jnp.where(ob, pos, 0))
            results_sorted.append(((peer_first - part_start + 1), None))
            continue
        if s.kind == "dense_rank":
            dr = _seg_sum_scan(pb, ob.astype(jnp.int64))
            results_sorted.append((dr, None))
            continue
        if s.kind in ("percent_rank", "cume_dist", "ntile"):
            part_end = _seg_backfill_from_last(pb_rev, pos)
            psize = (part_end - part_start + 1).astype(jnp.float64)
            if s.kind == "percent_rank":
                peer_first = lax.associative_scan(
                    jnp.maximum, jnp.where(ob, pos, 0))
                rk = (peer_first - part_start).astype(jnp.float64)
                out = rk / jnp.maximum(psize - 1, 1)
                results_sorted.append((out, None))
            elif s.kind == "cume_dist":
                # peers share the value at the END of their peer group
                peer_end = _seg_backfill_from_last(ob_rev, pos)
                out = (peer_end - part_start + 1).astype(jnp.float64) \
                    / psize
                results_sorted.append((out, None))
            else:  # ntile(k)
                k = jnp.float64(s.offset)
                rn0 = (pos - part_start).astype(jnp.float64)
                out = jnp.floor(rn0 * k / psize).astype(jnp.int64) + 1
                results_sorted.append((out, None))
            continue
        if s.kind in ("lag", "lead"):
            k = s.offset
            if s.kind == "lag":
                shifted = jnp.concatenate(
                    [jnp.zeros(k, dtype=data_s.dtype), data_s[:-k]]) \
                    if k > 0 else data_s
                sh_nn = jnp.concatenate(
                    [jnp.zeros(k, dtype=jnp.int8) + 1,
                     (nn_s if nn_s is not None
                      else jnp.zeros(cap, jnp.int8))[:-k]]) \
                    if k > 0 else (nn_s if nn_s is not None
                                   else jnp.zeros(cap, jnp.int8))
                outside = row_number <= k
            else:
                shifted = jnp.concatenate(
                    [data_s[k:], jnp.zeros(k, dtype=data_s.dtype)]) \
                    if k > 0 else data_s
                sh_nn = jnp.concatenate(
                    [(nn_s if nn_s is not None
                      else jnp.zeros(cap, jnp.int8))[k:],
                     jnp.zeros(k, dtype=jnp.int8) + 1]) \
                    if k > 0 else (nn_s if nn_s is not None
                                   else jnp.zeros(cap, jnp.int8))
                # outside if fewer than k rows remain in partition
                part_end = _seg_backfill_from_last(pb_rev, pos)
                outside = pos + k > part_end
            isnull = outside | (sh_nn != 0)
            results_sorted.append((shifted, isnull))
            continue
        has_frame = (s.rows_frame is not None
                     or s.range_frame is not None
                     or s.groups_frame is not None)

        # DISTINCT aggregates over the whole partition (reference:
        # WindowDistinctAggregator, function/window/
        # window_distinct_aggregator.cpp) — an auxiliary sort by
        # (partition, value) marks first occurrences; segmented sums of
        # those give the distinct count/sum per partition.
        if s.distinct:
            if s.kind not in ("count", "sum", "sum_float", "avg") \
                    or has_frame:
                raise NotImplementedError(
                    f"DISTINCT window {s.kind} with a frame")
            vkey = data_s
            if jnp.issubdtype(vkey.dtype, jnp.floating):
                vkey = vkey  # lax.sort totals-orders floats
            nn_key = (nn_s if nn_s is not None
                      else jnp.zeros(cap, jnp.int8))
            aux = lax.sort(
                [(~valid_s).astype(jnp.int32), *parts_s,
                 nn_key.astype(jnp.int32), vkey, rid_s],
                num_keys=3 + len(parts_s), is_stable=False)
            a_inv, a_parts = aux[0], aux[1:1 + len(parts_s)]
            a_nn = aux[1 + len(parts_s)]
            a_v = aux[2 + len(parts_s)]
            a_rid = aux[3 + len(parts_s)]
            apb = jnp.zeros(cap, dtype=bool).at[0].set(True)
            for k in (a_inv, *a_parts):
                apb = apb | jnp.concatenate(
                    [jnp.ones(1, dtype=bool), k[1:] != k[:-1]])
            first_occ = apb | jnp.concatenate(
                [jnp.ones(1, dtype=bool),
                 (a_v[1:] != a_v[:-1]) | (a_nn[1:] != a_nn[:-1])])
            live = (a_inv == 0) & (a_nn == 0) & first_occ
            apb_rev = rev_boundary(apb)
            if s.kind == "count":
                run = _seg_sum_scan(apb, live.astype(jnp.int64))
                tot = _seg_backfill_from_last(apb_rev, run)
                out, nl = tot, None
            else:
                acc = _acc_dtype(s.kind, a_v.dtype)
                sv = jnp.where(live, a_v.astype(acc), jnp.zeros((), acc))
                run = _seg_sum_scan(apb, sv)
                tot = _seg_backfill_from_last(apb_rev, run)
                cnt = _seg_backfill_from_last(
                    apb_rev, _seg_sum_scan(apb, live.astype(jnp.int64)))
                if s.kind == "avg":
                    out = tot.astype(jnp.float64) / jnp.maximum(cnt, 1)
                else:
                    out = tot
                nl = cnt == 0
            # aux order -> original order (sort by carried rowid), then
            # original -> main sorted order via one gather on rid_s
            packed = [a_rid, out] + ([] if nl is None
                                     else [nl.astype(jnp.int8)])
            back = lax.sort(packed, num_keys=1, is_stable=False)
            out_m = jnp.take(back[1], rid_s)
            nl_m = None if nl is None else jnp.take(back[2], rid_s) != 0
            results_sorted.append((out_m, nl_m))
            continue

        # value functions through explicit frames + nth_value
        # (reference: WindowValueExecutor, function/window/
        # window_value_function.cpp)
        if s.kind == "nth_value" or (
                s.kind in ("first_value", "last_value") and has_frame):
            lo_i, hi_i, _pe = _frame_bounds(
                s, parts_s, orders_s, oval_s, onn_s, valid_s,
                pb, ob, ob_rev, pb_rev, part_start, pos, cap)
            empty = hi_i < lo_i
            if s.kind == "first_value":
                p = lo_i
            elif s.kind == "last_value":
                p = hi_i
            else:
                p = lo_i + (s.offset - 1)
                empty = empty | (p > hi_i)
            p = jnp.clip(p, 0, cap - 1).astype(jnp.int64)
            out = jnp.take(data_s, p)
            nl = empty
            if nn_s is not None:
                nl = nl | (jnp.take(nn_s, p) != 0)
            results_sorted.append((out, nl))
            continue

        if s.kind == "first_value":
            fv = lax.associative_scan(
                jnp.maximum, jnp.where(pb, pos, 0))  # partition first pos
            # value at partition start: forward fill data from starts
            def ff(a, b):
                fa, va = a
                fb, vb = b
                return fa | fb, jnp.where(fb, vb, va)
            _, v = lax.associative_scan(ff, (pb, data_s))
            results_sorted.append((v, None if nn_s is None
                                   else _ff_nulls(pb, nn_s)))
            continue
        if s.kind == "last_value":
            # default frame: value at current peer-group end
            v = _seg_backfill_from_last(ob_rev, data_s)
            results_sorted.append((v, None if nn_s is None
                                   else _bf_nulls(ob_rev, nn_s)))
            continue

        # explicit ROWS / RANGE / GROUPS frame: sliding sums via prefix
        # differences; sliding min/max via sparse-table range queries
        # (scatter-free analog of the reference's window segment tree,
        # src/function/window/window_segment_tree.cpp).  EXCLUDE
        # subtracts the excluded sub-interval (sums) or splits the
        # query interval in two (extrema).
        if (has_frame or s.exclude) \
                and s.kind in ("sum", "sum_float", "avg", "count",
                               "count_star", "min", "max"):
            lo_i, hi_i, part_end = _frame_bounds(
                s, parts_s, orders_s, oval_s, onn_s, valid_s,
                pb, ob, ob_rev, pb_rev, part_start, pos, cap)
            hi_i = jnp.clip(hi_i, 0, cap - 1).astype(jnp.int64)
            lo_i = jnp.clip(lo_i, 0, cap - 1).astype(jnp.int64)
            empty = hi_i < lo_i
            hi_i = jnp.maximum(hi_i, lo_i)

            # excluded sub-interval [xlo, xhi] (clipped to the frame);
            # xhi < xlo means nothing is excluded
            if s.exclude in ("group", "ties"):
                peer_first = lax.associative_scan(
                    jnp.maximum, jnp.where(ob, pos, 0))
                peer_end = _seg_backfill_from_last(ob_rev, pos)
                xlo = jnp.maximum(lo_i, peer_first)
                xhi = jnp.minimum(hi_i, peer_end)
            elif s.exclude == "current row":
                xlo = jnp.maximum(lo_i, pos)
                xhi = jnp.minimum(hi_i, pos)
            else:
                xlo = jnp.ones_like(pos)
                xhi = jnp.zeros_like(pos)
            xlo = jnp.clip(xlo, 0, cap - 1).astype(jnp.int64)
            xhi = jnp.clip(xhi, -1, cap - 1).astype(jnp.int64)
            cur_in = (lo_i <= pos) & (pos <= hi_i) & ~empty

            if s.kind in ("min", "max"):
                is_min = s.kind == "min"
                big = _extreme(data_s.dtype, s.kind)
                v = jnp.where(notnull, data_s, big)
                nnl = notnull.astype(jnp.int64)
                prefc = jnp.cumsum(nnl)

                def rngc(lo, hi):
                    return jnp.take(prefc, hi) \
                        - (jnp.take(prefc, lo) - jnp.take(nnl, lo))
                if s.exclude:
                    has_x = xhi >= xlo
                    # left part [lo_i, xlo-1], right part [xhi+1, hi_i]
                    llo, lhi = lo_i, jnp.maximum(xlo - 1, lo_i)
                    lempty = empty | (xlo <= lo_i)
                    rlo = jnp.clip(jnp.minimum(xhi + 1, hi_i), 0,
                                   cap - 1)
                    rhi = hi_i
                    rempty = empty | (xhi >= hi_i)
                    a = _range_extrema(v, llo, lhi, is_min)
                    b2 = _range_extrema(v, rlo, rhi, is_min)
                    a = jnp.where(lempty & has_x, big, a)
                    b2 = jnp.where(rempty & has_x, big, b2)
                    op = jnp.minimum if is_min else jnp.maximum
                    out = op(a, b2)
                    wcnt = jnp.where(empty, 0, rngc(lo_i, hi_i)) \
                        - jnp.where(has_x, rngc(xlo, jnp.maximum(
                            xhi, xlo)), 0)
                    if s.exclude == "ties":
                        # keep the current row itself
                        keep = cur_in & notnull
                        out = jnp.where(keep, op(out, data_s), out)
                        wcnt = wcnt + jnp.where(cur_in, nnl, 0)
                elif s.rows_frame == (None, 0):
                    # running frame: a segmented scan suffices
                    out = _seg_minmax_scan(pb, v, is_min)
                    wcnt = _seg_sum_scan(pb, nnl)
                else:
                    out = _range_extrema(v, lo_i, hi_i, is_min)
                    wcnt = jnp.where(empty, 0, rngc(lo_i, hi_i))
                results_sorted.append((out, wcnt == 0))
                continue

            if s.kind == "count_star":
                v = valid_s.astype(jnp.int64)
                nn_cnt = v
            elif s.kind == "count":
                v = notnull.astype(jnp.int64)
                nn_cnt = v
            else:
                acc = _acc_dtype(s.kind, data_s.dtype)
                v = jnp.where(notnull, data_s.astype(acc),
                              jnp.zeros((), acc))
                nn_cnt = notnull.astype(jnp.int64)
            pref = jnp.cumsum(v)
            prefc = jnp.cumsum(nn_cnt)

            def rng_sum(p, base, lo, hi):
                hi_v = jnp.take(p, hi)
                lo_v = jnp.take(p, lo) - jnp.take(base, lo)
                return hi_v - lo_v
            wsum = jnp.where(empty, 0, rng_sum(pref, v, lo_i, hi_i))
            wcnt = jnp.where(empty, 0, rng_sum(prefc, nn_cnt, lo_i,
                                               hi_i))
            if s.exclude:
                has_x = (xhi >= xlo) & ~empty
                xs = rng_sum(pref, v, xlo, jnp.maximum(xhi, xlo))
                xc = rng_sum(prefc, nn_cnt, xlo, jnp.maximum(xhi, xlo))
                wsum = wsum - jnp.where(has_x, xs, 0)
                wcnt = wcnt - jnp.where(has_x, xc, 0)
                if s.exclude == "ties":
                    wsum = wsum + jnp.where(cur_in, v, 0)
                    wcnt = wcnt + jnp.where(cur_in, nn_cnt, 0)
            if s.kind in ("count", "count_star"):
                results_sorted.append((wcnt, None))
            elif s.kind == "avg":
                results_sorted.append((wsum.astype(jnp.float64)
                                       / jnp.maximum(wcnt, 1),
                                       wcnt == 0))
            else:
                results_sorted.append((wsum, wcnt == 0))
            continue

        # aggregates
        if s.kind == "count_star":
            run = _seg_sum_scan(pb, valid_s.astype(jnp.int64))
            whole = s.whole_partition or not s.has_order
            out = _frame_value(run, pb_rev, ob_rev, whole)
            results_sorted.append((out, None))
            continue
        if s.kind == "count":
            run = _seg_sum_scan(pb, notnull.astype(jnp.int64))
            out = _frame_value(run, pb_rev, ob_rev,
                               s.whole_partition or not s.has_order)
            results_sorted.append((out, None))
            continue
        if s.kind in ("sum", "sum_float", "avg"):
            acc = _acc_dtype(s.kind, data_s.dtype)
            v = jnp.where(notnull, data_s.astype(acc),
                          jnp.zeros((), acc))
            run = _seg_sum_scan(pb, v)
            cnt = _seg_sum_scan(pb, notnull.astype(jnp.int64))
            whole = s.whole_partition or not s.has_order
            out = _frame_value(run, pb_rev, ob_rev, whole)
            cnt_f = _frame_value(cnt, pb_rev, ob_rev, whole)
            if s.kind == "avg":
                results_sorted.append((out.astype(jnp.float64)
                                       / jnp.maximum(cnt_f, 1),
                                       cnt_f == 0))
            else:
                results_sorted.append((out, cnt_f == 0))
            continue
        if s.kind in ("min", "max"):
            big = _extreme(data_s.dtype, s.kind)
            v = jnp.where(notnull, data_s, big)
            run = _seg_minmax_scan(pb, v, s.kind == "min")
            cnt = _seg_sum_scan(pb, notnull.astype(jnp.int64))
            whole = s.whole_partition or not s.has_order
            out = _frame_value(run, pb_rev, ob_rev, whole)
            cnt_f = _frame_value(cnt, pb_rev, ob_rev, whole)
            results_sorted.append((out, cnt_f == 0))
            continue
        raise NotImplementedError(f"window {s.kind}")

    # restore original order: sort by rowid carrying all results
    flat = []
    layout = []
    for d, n in results_sorted:
        layout.append(n is not None)
        flat.append(d)
        if n is not None:
            flat.append(n.astype(jnp.int8))
    restored = lax.sort([rid_s, *flat], num_keys=1, is_stable=False)[1:]
    out = []
    i = 0
    for has_null in layout:
        d = restored[i]
        i += 1
        n = None
        if has_null:
            n = restored[i] != 0
            i += 1
        out.append((d, n))
    return out


def _groups_frame_bounds(s, parts_s, valid_s, pb, ob, ob_rev,
                         part_start, part_end, pos, cap):
    """Positions (lo_i, hi_i) of a GROUPS frame: peer-group distances
    (reference: GROUPS boundaries in
    function/window/window_boundaries_state.cpp).  The group index is
    the dense rank of the row's peer group within its partition."""
    pre, post = s.groups_frame
    dr = _seg_sum_scan(pb, ob.astype(jnp.int64))   # 1-based group idx
    if pre is not None:
        cnt_lo = _rank_in_partition(parts_s, valid_s, dr, dr - pre,
                                    strict=True, valid_s=valid_s)
        lo_i = part_start + cnt_lo
    else:
        lo_i = part_start
    if post is not None:
        cnt_hi = _rank_in_partition(parts_s, valid_s, dr, dr + post,
                                    strict=False, valid_s=valid_s)
        hi_i = part_start + cnt_hi - 1
    else:
        hi_i = part_end
    return lo_i, hi_i


def _frame_bounds(s, parts_s, orders_s, oval_s, onn_s, valid_s,
                  pb, ob, ob_rev, pb_rev, part_start, pos, cap):
    """(lo_i, hi_i) sorted-space positions of the spec's frame; the
    dialect-default frame (RANGE unbounded-preceding..current peer end,
    or the whole partition without ORDER BY) when no explicit frame."""
    part_end = _seg_backfill_from_last(pb_rev, pos)
    if s.rows_frame is not None:
        pre, post = s.rows_frame
        lo_i = part_start if pre is None else \
            jnp.maximum(pos - pre, part_start)
        hi_i = part_end if post is None else \
            jnp.minimum(pos + post, part_end)
    elif s.range_frame is not None:
        lo_i, hi_i = _range_frame_bounds(
            s, parts_s, orders_s, oval_s, onn_s, valid_s,
            pb, ob, ob_rev, part_start, part_end, pos, cap)
    elif s.groups_frame is not None:
        lo_i, hi_i = _groups_frame_bounds(
            s, parts_s, valid_s, pb, ob, ob_rev, part_start, part_end,
            pos, cap)
    elif s.whole_partition or not s.has_order:
        lo_i, hi_i = part_start, part_end
    else:
        # default: partition start .. end of current peer group
        lo_i = part_start
        hi_i = _seg_backfill_from_last(ob_rev, pos)
    return lo_i, hi_i, part_end


def _range_extrema(v: jax.Array, lo: jax.Array, hi: jax.Array,
                   is_min: bool) -> jax.Array:
    """min/max of v[lo..hi] (inclusive, lo<=hi) per row via a sparse
    table: O(n log n) build of power-of-two interval extrema, then two
    gathers per row — scatter-free, data-independent shapes (the TPU
    analog of the reference's window segment tree,
    src/function/window/window_segment_tree.cpp)."""
    op = jnp.minimum if is_min else jnp.maximum
    n = v.shape[0]
    ident = _extreme(v.dtype, "min" if is_min else "max")
    levels = [v]
    step = 1
    while step < n:
        prev = levels[-1]
        pad = jnp.full((min(step, n),), ident, dtype=v.dtype)
        levels.append(op(prev, jnp.concatenate([prev[step:], pad])))
        step *= 2
    table = jnp.stack(levels)            # (K, n)
    width = (hi - lo + 1).astype(jnp.int64)
    # level k = floor(log2(width)); two overlapping 2^k windows cover it
    k = (jnp.int64(63) - lax.clz(width)).astype(jnp.int64)
    flat = table.reshape(-1)
    a = jnp.take(flat, k * n + lo)
    b = jnp.take(flat, k * n + hi - (jnp.int64(1) << k) + 1)
    return op(a, b)


def _rank_in_partition(parts_s, count_mask, enc_vals, enc_thr,
                       strict: bool, valid_s=None):
    """Per row i: number of rows j in i's partition with count_mask[j]
    and enc_vals[j] < enc_thr[i] (<= when strict=False).  Both sequences
    are merged in ONE sort (queries tie-broken before/after equal reals),
    then a segmented running count answers every query — scatter-free.
    valid_s segregates dead (padding) rows into their own segment so
    they never contaminate counts — required when parts_s is empty."""
    cap = enc_vals.shape[0]
    keys = [jnp.concatenate([p, p]) for p in parts_s]
    if valid_s is not None:
        keys.insert(0, jnp.concatenate(
            [(~valid_s).astype(jnp.int32)] * 2))
    vals = jnp.concatenate([enc_vals, enc_thr])
    if strict:
        # queries sort BEFORE equal reals: equal values not counted
        tag = jnp.concatenate([jnp.ones(cap, jnp.int32),
                               jnp.zeros(cap, jnp.int32)])
    else:
        tag = jnp.concatenate([jnp.zeros(cap, jnp.int32),
                               jnp.ones(cap, jnp.int32)])
    idx = lax.broadcasted_iota(jnp.int32, (2 * cap,), 0)
    cm = jnp.concatenate([count_mask.astype(jnp.int64),
                          jnp.zeros(cap, jnp.int64)])
    ops = [*keys, vals, tag, idx, cm]
    nk = len(keys) + 2
    sorted_ = lax.sort(ops, num_keys=nk, is_stable=True)
    keys_m = sorted_[:len(keys)]
    idx_m = sorted_[nk]
    cm_m = sorted_[nk + 1]
    pbm = jnp.zeros(2 * cap, dtype=bool).at[0].set(True)
    for k in keys_m:
        pbm = pbm | jnp.concatenate([jnp.ones(1, dtype=bool),
                                     k[1:] != k[:-1]])
    cnt = _seg_sum_scan(pbm, cm_m)
    _, cnt_o = lax.sort([idx_m, cnt], num_keys=1, is_stable=False)
    return cnt_o[cap:]


def _range_frame_bounds(s, parts_s, orders_s, oval_s, onn_s, valid_s,
                        pb, ob, ob_rev, part_start, part_end, pos, cap):
    """Positions (lo_i, hi_i) of a RANGE value frame in the sorted space
    (reference: function/window/window_executor.cpp value boundaries).
    NULL-order rows frame over their own peer group."""
    from . import sortkey
    pre, post = s.range_frame
    o_isnull = onn_s != 0
    o_notnull = valid_s & ~o_isnull

    def enc(x):
        e = sortkey._orderable(x, s.order_dtype).astype(jnp.int64)
        return ~e if s.order_desc else e

    enc_real = jnp.where(o_notnull, enc(oval_s),
                         jnp.int64(2**63 - 1))
    # base position of the non-NULL region within each partition
    nulls_in_part = _seg_sum_scan(pb, o_isnull.astype(jnp.int64))
    total_nulls = _seg_backfill_from_last(
        jnp.concatenate([pb[1:], jnp.ones(1, dtype=bool)])[::-1],
        nulls_in_part)
    base = part_start + (total_nulls if s.order_nulls_first else 0)

    sign = -1 if s.order_desc else 1
    if pre is not None:
        thr_lo = enc(oval_s - sign * pre)
        cnt_lo = _rank_in_partition(parts_s, o_notnull, enc_real, thr_lo,
                                    strict=True, valid_s=valid_s)
        lo_i = base + cnt_lo
    else:
        lo_i = base
    nn_total = _seg_backfill_from_last(
        jnp.concatenate([pb[1:], jnp.ones(1, dtype=bool)])[::-1],
        _seg_sum_scan(pb, o_notnull.astype(jnp.int64)))
    if post is not None:
        thr_hi = enc(oval_s + sign * post)
        cnt_hi = _rank_in_partition(parts_s, o_notnull, enc_real, thr_hi,
                                    strict=False, valid_s=valid_s)
        hi_i = base + cnt_hi - 1
    else:
        hi_i = base + nn_total - 1
    # NULL-order rows: frame = their peer group
    peer_first = lax.associative_scan(jnp.maximum, jnp.where(ob, pos, 0))
    peer_end = _seg_backfill_from_last(ob_rev, pos)
    lo_i = jnp.where(o_isnull, peer_first, lo_i)
    hi_i = jnp.where(o_isnull, peer_end, hi_i)
    return lo_i, hi_i


def _ff_nulls(pb, nn_s):
    def ff(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va)
    _, v = lax.associative_scan(ff, (pb, nn_s))
    return v != 0


def _bf_nulls(ob_rev, nn_s):
    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va)
    _, v = lax.associative_scan(op, (ob_rev, nn_s[::-1]))
    return v[::-1] != 0


def _frame_value(running, pb_rev, ob_rev, whole_partition: bool):
    """Map a running (inclusive) scan to the default-frame value:
    whole partition => value at partition end; RANGE current-row =>
    value at peer-group end."""
    if whole_partition:
        return _seg_backfill_from_last(pb_rev, running)
    return _seg_backfill_from_last(ob_rev, running)
