"""Substrate tests: batches, expressions, hand-built plans.

Mirrors the reference's unit-test strategy for vector ops / operators
(reference: test/common/, test/sql/aggregate, test/sql/join) but over
hand-bound plans; SQL-level tests live in test_sql.py.
"""

import decimal

import numpy as np
import pytest

import ddb_tpu
from ddb_tpu import types as T
from ddb_tpu.expr import ir
from ddb_tpu.plan import logical as L


@pytest.fixture()
def con():
    return ddb_tpu.connect()


def colref(table, name):
    sch = table.schema
    i = sch.index_of(name)
    f = sch.field(i)
    return ir.ColRef(i, f.dtype, name, f.strdict)


def test_scan_and_filter(con):
    con.register("t", {"a": [1, 2, 3, 4, 5], "b": [10, 20, 30, 40, 50]})
    t = con.table_data("t")
    get = L.Get(t, [0, 1])
    pred = ir.bind_comparison(">", colref(t, "a"),
                              ir.Const(2, T.INTEGER))
    plan = L.Filter(get, pred)
    rows = con.execute_plan(plan).fetchall()
    assert rows == [(3, 30), (4, 40), (5, 50)]


def test_projection_arith(con):
    con.register("t", {"a": [1, 2, 3]})
    t = con.table_data("t")
    e = ir.bind_arith("+", colref(t, "a"), ir.Const(100, T.INTEGER))
    plan = L.Project(L.Get(t, [0]), [e], ["x"])
    assert con.execute_plan(plan).fetchall() == [(101,), (102,), (103,)]


def test_grouped_aggregate_ints(con):
    con.register("t", {"k": [1, 2, 1, 2, 3], "v": [10, 20, 30, 40, 50]})
    t = con.table_data("t")
    plan = L.Aggregate(
        L.Get(t, [0, 1]),
        groups=[colref(t, "k")],
        aggs=[L.AggSpec("sum", colref(t, "v"), T.BIGINT, "s"),
              L.AggSpec("count_star", None, T.BIGINT, "c"),
              L.AggSpec("min", colref(t, "v"), T.INTEGER, "mn"),
              L.AggSpec("max", colref(t, "v"), T.INTEGER, "mx")],
        group_names=["k"])
    rows = sorted(con.execute_plan(plan).fetchall())
    assert rows == [(1, 40, 2, 10, 30), (2, 60, 2, 20, 40),
                    (3, 50, 1, 50, 50)]


def test_ungrouped_aggregate(con):
    con.register("t", {"v": [1.5, 2.5, 3.0]})
    t = con.table_data("t")
    plan = L.Aggregate(
        L.Get(t, [0]), groups=[],
        aggs=[L.AggSpec("sum", colref(t, "v"), T.DOUBLE, "s"),
              L.AggSpec("avg", colref(t, "v"), T.DOUBLE, "a"),
              L.AggSpec("count_star", None, T.BIGINT, "c")])
    rows = con.execute_plan(plan).fetchall()
    assert rows == [(7.0, pytest.approx(7.0 / 3), 3)]


def test_string_group_perfect_hash(con):
    con.register("t", {"s": ["x", "y", "x", "z", "y", "x"],
                       "v": [1, 2, 3, 4, 5, 6]})
    t = con.table_data("t")
    plan = L.Aggregate(
        L.Get(t, [0, 1]),
        groups=[colref(t, "s")],
        aggs=[L.AggSpec("sum", colref(t, "v"), T.BIGINT, "s")],
        group_names=["s"])
    rows = sorted(con.execute_plan(plan).fetchall())
    assert rows == [("x", 10), ("y", 7), ("z", 4)]


def test_inner_join(con):
    con.register("l", {"k": [1, 2, 3, 2], "a": [10, 20, 30, 21]})
    con.register("r", {"k": [2, 3, 4], "b": [200, 300, 400]})
    lt, rt = con.table_data("l"), con.table_data("r")
    plan = L.Join(L.Get(lt, [0, 1]), L.Get(rt, [0, 1]), "inner",
                  [L.JoinCond(colref(lt, "k"), colref(rt, "k"))])
    rows = sorted(con.execute_plan(plan).fetchall())
    assert rows == [(2, 20, 2, 200), (2, 21, 2, 200), (3, 30, 3, 300)]


def test_left_join(con):
    con.register("l", {"k": [1, 2], "a": [10, 20]})
    con.register("r", {"k": [2], "b": [200]})
    lt, rt = con.table_data("l"), con.table_data("r")
    plan = L.Join(L.Get(lt, [0, 1]), L.Get(rt, [0, 1]), "left",
                  [L.JoinCond(colref(lt, "k"), colref(rt, "k"))])
    rows = sorted(con.execute_plan(plan).fetchall(),
                  key=lambda r: r[0])
    assert rows == [(1, 10, None, None), (2, 20, 2, 200)]


def test_semi_anti_join(con):
    con.register("l", {"k": [1, 2, 3]})
    con.register("r", {"k": [2, 2, 5]})
    lt, rt = con.table_data("l"), con.table_data("r")
    semi = L.Join(L.Get(lt, [0]), L.Get(rt, [0]), "semi",
                  [L.JoinCond(colref(lt, "k"), colref(rt, "k"))])
    assert sorted(con.execute_plan(semi).fetchall()) == [(2,)]
    anti = L.Join(L.Get(lt, [0]), L.Get(rt, [0]), "anti",
                  [L.JoinCond(colref(lt, "k"), colref(rt, "k"))])
    assert sorted(con.execute_plan(anti).fetchall()) == [(1,), (3,)]


def test_order_limit(con):
    con.register("t", {"a": [3, 1, 2, 5, 4]})
    t = con.table_data("t")
    plan = L.Limit(L.Order(L.Get(t, [0]),
                           [L.OrderKey(colref(t, "a"), desc=True)]), 3)
    assert con.execute_plan(plan).fetchall() == [(5,), (4,), (3,)]


def test_decimal_arith_and_sum(con):
    import pyarrow as pa
    dec = pa.array([decimal.Decimal("1.25"), decimal.Decimal("2.50"),
                    decimal.Decimal("0.05")], pa.decimal128(15, 2))
    con.register("t", pa.table({"d": dec}))
    t = con.table_data("t")
    two = ir.Const(T.encode_literal("2.0", T.DECIMAL(15, 1)),
                   T.DECIMAL(15, 1))
    prod = ir.bind_arith("*", colref(t, "d"), two)
    assert prod.dtype.scale == 3
    plan = L.Aggregate(
        L.Project(L.Get(t, [0]), [prod], ["p"]), groups=[],
        aggs=[L.AggSpec("sum", ir.ColRef(0, prod.dtype, "p"),
                        T.DECIMAL(18, 3), "s")])
    rows = con.execute_plan(plan).fetchall()
    assert rows == [(decimal.Decimal("7.600"),)]


def test_nulls_in_aggregate(con):
    import pyarrow as pa
    con.register("t", pa.table({"k": [1, 1, 2, 2],
                                "v": [10, None, None, None]}))
    t = con.table_data("t")
    plan = L.Aggregate(
        L.Get(t, [0, 1]),
        groups=[colref(t, "k")],
        aggs=[L.AggSpec("sum", colref(t, "v"), T.BIGINT, "s"),
              L.AggSpec("count", colref(t, "v"), T.BIGINT, "c")],
        group_names=["k"])
    rows = sorted(con.execute_plan(plan).fetchall())
    assert rows == [(1, 10, 1), (2, None, 0)]


def test_distinct(con):
    con.register("t", {"a": [1, 2, 1, 3, 2]})
    t = con.table_data("t")
    plan = L.Distinct(L.Get(t, [0]))
    assert sorted(con.execute_plan(plan).fetchall()) == [(1,), (2,), (3,)]


def test_case_expression(con):
    con.register("t", {"a": [1, 2, 3]})
    t = con.table_data("t")
    c = ir.Case(
        whens=[(ir.bind_comparison("==", colref(t, "a"),
                                   ir.Const(2, T.INTEGER)),
                ir.Const(100, T.INTEGER))],
        else_=ir.Const(0, T.INTEGER), dtype=T.INTEGER)
    plan = L.Project(L.Get(t, [0]), [c], ["x"])
    assert con.execute_plan(plan).fetchall() == [(0,), (100,), (0,)]


def test_multikey_join(con):
    con.register("l", {"k1": [1, 1, 2], "k2": [5, 6, 5], "a": [1, 2, 3]})
    con.register("r", {"k1": [1, 2], "k2": [6, 5], "b": [10, 20]})
    lt, rt = con.table_data("l"), con.table_data("r")
    plan = L.Join(L.Get(lt, [0, 1, 2]), L.Get(rt, [0, 1, 2]), "inner",
                  [L.JoinCond(colref(lt, "k1"), colref(rt, "k1")),
                   L.JoinCond(colref(lt, "k2"), colref(rt, "k2"))])
    rows = sorted(con.execute_plan(plan).fetchall())
    assert rows == [(1, 6, 2, 1, 6, 10), (2, 5, 3, 2, 5, 20)]


def test_dates(con):
    import datetime
    import pyarrow as pa
    con.register("t", pa.table({
        "d": pa.array([datetime.date(1994, 1, 1),
                       datetime.date(1995, 6, 15)])}))
    t = con.table_data("t")
    y = ir.Func("year", [colref(t, "d")], T.BIGINT)
    plan = L.Project(L.Get(t, [0]), [y], ["y"])
    assert con.execute_plan(plan).fetchall() == [(1994,), (1995,)]
