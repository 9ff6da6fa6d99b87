"""Expression IR -> fused jnp evaluation.

The whole expression tree evaluates as one traced jnp computation over a
Batch, so XLA fuses it into a handful of VPU loops — replacing the
reference's interpreted per-node ExpressionExecutor dispatch
(reference: src/execution/expression_executor.cpp, adaptive_filter.hpp:22).

Every node evaluates to (data, nulls) where nulls is an optional bool array
(True => NULL).  SQL three-valued logic:
  * arithmetic/comparison propagate NULL if any input is NULL
  * AND/OR use Kleene logic
  * predicates used as filters treat NULL as False (select_mask)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import types as T
from ..types import TypeId
from . import ir
from ..batch import Batch


def _or_nulls(*masks):
    masks = [m for m in masks if m is not None]
    if not masks:
        return None
    out = masks[0]
    for m in masks[1:]:
        out = out | m
    return out


def evaluate(e: ir.Expr, batch: Batch):
    """Returns (data: jax.Array[cap], nulls: Optional[bool jax.Array[cap]])."""
    return _EVAL[type(e)](e, batch)


def select_mask(e: ir.Expr, batch: Batch):
    """Predicate -> row mask: TRUE rows only (NULL => False), ANDed with sel."""
    data, nulls = evaluate(e, batch)
    m = data
    if nulls is not None:
        m = m & ~nulls
    return m & batch.sel


# ---------------------------------------------------------------------------

def _eval_colref(e: ir.ColRef, b: Batch):
    col = b.columns[e.index]
    return col.data, col.nulls


def _eval_const(e: ir.Const, b: Batch):
    cap = b.sel.shape[0]
    dt = e.dtype.np_dtype
    if e.value is None:
        return (jnp.zeros(cap, dtype=dt), jnp.ones(cap, dtype=bool))
    return (jnp.full(cap, e.value, dtype=dt), None)


def _eval_cast(e: ir.Cast, b: Batch):
    data, nulls = evaluate(e.child, b)
    src, dst = e.src, e.dtype
    out = _cast_data(data, src, dst)
    return out, nulls


def _cast_data(data, src, dst):
    if src == dst:
        return data
    sid, did = src.id, dst.id
    if sid == TypeId.DECIMAL and did == TypeId.DECIMAL:
        if dst.scale > src.scale:
            return data.astype(jnp.int64) * T.decimal_scale_factor(
                dst.scale - src.scale)
        if dst.scale < src.scale:
            return _div_floor_to_even(data, src.scale - dst.scale)
        return data
    if did == TypeId.DECIMAL:
        if src.is_integer:
            return data.astype(jnp.int64) * T.decimal_scale_factor(dst.scale)
        if sid in (TypeId.FLOAT, TypeId.DOUBLE):
            return jnp.rint(
                data.astype(jnp.float64) * T.decimal_scale_factor(dst.scale)
            ).astype(jnp.int64)
    if sid == TypeId.DECIMAL:
        if did in (TypeId.FLOAT, TypeId.DOUBLE):
            return (data.astype(np.dtype(dst.np_dtype))
                    / T.decimal_scale_factor(src.scale))
        if dst.is_integer:
            return _div_floor_to_even(data, src.scale).astype(dst.np_dtype)
    if sid == TypeId.DATE and did in (TypeId.TIMESTAMP,
                                      TypeId.TIMESTAMPTZ):
        return data.astype(jnp.int64) * 86_400_000_000
    if sid in (TypeId.TIMESTAMP, TypeId.TIMESTAMPTZ) \
            and did == TypeId.DATE:
        # floor-divide handles pre-epoch instants correctly
        return jnp.floor_divide(data.astype(jnp.int64),
                                86_400_000_000).astype(jnp.int32)
    if sid in (TypeId.TIMESTAMP, TypeId.TIMESTAMPTZ) \
            and did == TypeId.TIME:
        return jnp.mod(data.astype(jnp.int64), 86_400_000_000)
    # TIMETZ packing: utc_micros * 2^17 + (57599 - offset_sec)
    # (reference: dtime_tz_t, src/include/duckdb/common/types/time.hpp)
    if did == TypeId.TIMETZ and sid == TypeId.TIME:
        return data.astype(jnp.int64) * 131072 + 57599   # offset +00
    if sid == TypeId.TIMETZ and did == TypeId.TIME:
        d64 = data.astype(jnp.int64)
        utc = jnp.floor_divide(d64, 131072)
        off = 57599 - (d64 - utc * 131072)
        return jnp.mod(utc + off * 1_000_000, 86_400_000_000)
    if sid in (TypeId.TIMESTAMP, TypeId.TIMESTAMPTZ) \
            and did == TypeId.TIMETZ:
        return jnp.mod(data.astype(jnp.int64),
                       86_400_000_000) * 131072 + 57599
    if sid in (TypeId.FLOAT, TypeId.DOUBLE) and dst.is_integer:
        # float -> integer ROUNDS half-to-even (reference:
        # std::nearbyint in NumericTryCast, cast_operators.hpp)
        return jnp.rint(data).astype(np.dtype(dst.np_dtype))
    # default numeric conversion
    return data.astype(np.dtype(dst.np_dtype))


def _div_floor_to_even(data, scale_diff):
    """Divide by 10^k with round-half-away-from-zero (duckdb semantics)."""
    f = T.decimal_scale_factor(scale_diff)
    data = data.astype(jnp.int64)
    half = f // 2
    adj = jnp.where(data >= 0, data + half, data - half)
    return adj // f


def _eval_arith(e: ir.Arith, b: Batch):
    ld, ln = evaluate(e.left, b)
    rd, rn = evaluate(e.right, b)
    nulls = _or_nulls(ln, rn)
    op = e.op
    if op == "+":
        out = ld + rd
    elif op == "-":
        out = ld - rd
    elif op == "*":
        if e.dtype.id == TypeId.DECIMAL:
            out = ld.astype(jnp.int64) * rd.astype(jnp.int64)
        else:
            out = ld * rd
    elif op == "/":
        out = ld / rd
    elif op == "//":
        safe = jnp.where(rd == 0, 1, rd)
        if jnp.issubdtype(ld.dtype, jnp.floating) \
                or jnp.issubdtype(rd.dtype, jnp.floating):
            # reference: float // is plain division (-7.5 // 2 = -3.75)
            out = ld / safe
        else:
            # integer division truncates toward zero (-7 // 2 = -3)
            q = ld // safe
            rfl = ld - q * safe
            out = q + ((rfl != 0) & ((ld < 0) != (safe < 0)))
        nulls = _or_nulls(nulls, rd == 0)
    elif op == "%":
        safe = jnp.where(rd == 0, 1, rd)
        # truncating modulo: sign follows the dividend (-7 % 2 = -1)
        if jnp.issubdtype(ld.dtype, jnp.floating) \
                or jnp.issubdtype(rd.dtype, jnp.floating):
            out = ld - jnp.trunc(ld / safe) * safe
        else:
            q = ld // safe
            rfl = ld - q * safe
            tq = q + ((rfl != 0) & ((ld < 0) != (safe < 0)))
            out = ld - tq * safe
        nulls = _or_nulls(nulls, rd == 0)
    elif op == "&":
        out = ld & rd
    elif op == "|":
        out = ld | rd
    elif op == "xor":
        out = ld ^ rd
    elif op == "<<":
        # shifts >= bit width are 0 in the reference; XLA leaves them
        # undefined, so mask explicitly
        width = jnp.iinfo(ld.dtype).bits
        out = jnp.where((rd >= width) | (rd < 0), 0,
                        jnp.left_shift(ld, jnp.clip(rd, 0, width - 1)))
    elif op == ">>":
        width = jnp.iinfo(ld.dtype).bits
        out = jnp.where((rd >= width) | (rd < 0), 0,
                        jnp.right_shift(ld, jnp.clip(rd, 0, width - 1)))
    else:
        raise ValueError(op)
    want = np.dtype(e.dtype.np_dtype)
    if out.dtype != want:
        out = out.astype(want)
    return out, nulls


_CMP = {
    "==": jnp.equal, "!=": jnp.not_equal,
    "<": jnp.less, "<=": jnp.less_equal,
    ">": jnp.greater, ">=": jnp.greater_equal,
}


def _eval_cmp(e: ir.Cmp, b: Batch):
    ld, ln = evaluate(e.left, b)
    rd, rn = evaluate(e.right, b)
    return _CMP[e.op](ld, rd), _or_nulls(ln, rn)


def _eval_boolop(e: ir.BoolOp, b: Batch):
    vals = [evaluate(a, b) for a in e.args]
    if e.op == "and":
        # Kleene: F if any F; else N if any N; else T
        any_false = None
        any_null = None
        acc = None
        for d, n in vals:
            v = d if n is None else (d & ~n)
            f = (~d) if n is None else (~d & ~n)
            acc = v if acc is None else (acc & v)
            any_false = f if any_false is None else (any_false | f)
            any_null = n if any_null is None else _or_nulls(any_null, n)
        if any_null is None:
            return acc, None
        return acc, any_null & ~any_false
    else:
        any_true = None
        any_null = None
        acc = None
        for d, n in vals:
            v = d if n is None else (d & ~n)
            acc = v if acc is None else (acc | v)
            any_true = v if any_true is None else (any_true | v)
            any_null = n if any_null is None else _or_nulls(any_null, n)
        if any_null is None:
            return acc, None
        return acc, any_null & ~any_true


def _eval_not(e: ir.Not, b: Batch):
    d, n = evaluate(e.child, b)
    return ~d, n


def _eval_isnull(e: ir.IsNull, b: Batch):
    d, n = evaluate(e.child, b)
    cap = d.shape[0]
    isn = jnp.zeros(cap, dtype=bool) if n is None else n
    return (~isn if e.negated else isn), None


def _eval_case(e: ir.Case, b: Batch):
    else_d, else_n = evaluate(e.else_, b)
    out = else_d.astype(np.dtype(e.dtype.np_dtype))
    out_n = else_n
    cap = out.shape[0]
    if out_n is None:
        out_n = jnp.zeros(cap, dtype=bool)
    decided = jnp.zeros(cap, dtype=bool)
    # first-match-wins, evaluated front to back
    for cond, val in e.whens:
        cd, cn = evaluate(cond, b)
        take = cd if cn is None else (cd & ~cn)
        take = take & ~decided
        vd, vn = evaluate(val, b)
        out = jnp.where(take, vd, out)
        if vn is None:
            out_n = jnp.where(take, False, out_n)
        else:
            out_n = jnp.where(take, vn, out_n)
        decided = decided | take
    return out, out_n


def _eval_inlist(e: ir.InList, b: Batch):
    d, n = evaluate(e.child, b)
    acc = jnp.zeros(d.shape[0], dtype=bool)
    for v in e.values:
        acc = acc | (d == v)
    if e.negated:
        acc = ~acc
    return acc, n


def _eval_dictlookup(e: ir.DictLookup, b: Batch):
    d, n = evaluate(e.child, b)
    if callable(e.table):
        # lazy table over a runtime-filled store: the lookup itself runs
        # through pure_callback so the table is built at EXECUTION time,
        # after whatever fills the store (the data dependency on the
        # codes orders it after same-kernel producers like __pyudf__)
        cap = d.shape[0]
        out_np = np.dtype(e.dtype.np_dtype)

        def host(codes):
            raw_table, raw_nulls = e.table()
            c = np.asarray(codes).astype(np.int64)
            if e.base:
                c = c - e.base
            nn = np.zeros(cap, dtype=bool)
            if len(raw_table) == 0:
                return (np.zeros(cap, dtype=out_np),
                        np.ones(cap, dtype=bool))
            c = np.clip(c, 0, len(raw_table) - 1)
            out = np.asarray(raw_table)[c].astype(out_np)
            if raw_nulls is not None:
                nn = np.asarray(raw_nulls)[c]
            return out, nn

        out, nn = jax.pure_callback(
            host, (jax.ShapeDtypeStruct((cap,), out_np),
                   jax.ShapeDtypeStruct((cap,), np.bool_)), d)
        return out, _or_nulls(n, nn)
    raw_table, raw_nulls = e.table, e.null_table
    table = jnp.asarray(raw_table)
    if table.shape[0] == 0:      # empty dictionary (e.g. empty table)
        nulls = n
        if raw_nulls is not None:
            nulls = jnp.ones(d.shape[0], dtype=bool)
        return jnp.zeros(d.shape[0], dtype=table.dtype), nulls
    if e.base:
        d = d - e.base
    idx = jnp.clip(d.astype(jnp.int32), 0, table.shape[0] - 1)
    nulls = n
    if raw_nulls is not None:
        nulls = _or_nulls(n, jnp.asarray(raw_nulls)[idx])
    return table[idx], nulls


def _eval_dictlookup2(e: ir.DictLookup2, b: Batch):
    ld, ln = evaluate(e.left, b)
    rd, rn = evaluate(e.right, b)
    table = jnp.asarray(e.table)
    nulls = _or_nulls(ln, rn)
    if table.shape[0] == 0:
        return jnp.zeros(ld.shape[0], dtype=table.dtype), nulls
    idx = ld.astype(jnp.int32) * e.right_card + rd.astype(jnp.int32)
    idx = jnp.clip(idx, 0, table.shape[0] - 1)
    if e.null_table is not None:
        nulls = _or_nulls(nulls, jnp.asarray(e.null_table)[idx])
    return table[idx], nulls


def _eval_func(e: ir.Func, b: Batch):
    from . import functions
    return functions.dispatch(e, b, evaluate)


_EVAL = {
    ir.ColRef: _eval_colref,
    ir.Const: _eval_const,
    ir.Cast: _eval_cast,
    ir.Arith: _eval_arith,
    ir.Cmp: _eval_cmp,
    ir.BoolOp: _eval_boolop,
    ir.Not: _eval_not,
    ir.IsNull: _eval_isnull,
    ir.Case: _eval_case,
    ir.InList: _eval_inlist,
    ir.DictLookup: _eval_dictlookup,
    ir.DictLookup2: _eval_dictlookup2,
    ir.Func: _eval_func,
}
