"""LIST type, UNNEST, list()/string_agg aggregates, string_split
(reference: LogicalType::LIST, physical_unnest.cpp,
extension/core_functions/aggregate/nested/list.cpp,
scalar/string/string_split.cpp).  List payloads live host-side (no
var-len device representation on TPU); rows carry int32 list ids."""

import pytest

from ddb_tpu import Connection


@pytest.fixture()
def con():
    c = Connection()
    c.sql("CREATE TABLE t (s VARCHAR, k INTEGER)")
    c.sql("INSERT INTO t VALUES ('a,b', 1), ('c', 2), ('d,e,f', 3)")
    return c


def test_list_literal(con):
    assert con.sql("SELECT [1,2,3]").fetchall() == [([1, 2, 3],)]
    assert con.sql("SELECT ['x','y']").fetchall() == [(["x", "y"],)]


def test_from_unnest_literal(con):
    assert con.sql("SELECT * FROM unnest([1,2,3])").fetchall() \
        == [(1,), (2,), (3,)]


def test_unnest_select_item(con):
    assert con.sql("SELECT unnest([10,20])").fetchall() == [(10,), (20,)]


def test_string_split_and_unnest(con):
    rows = con.sql(
        "SELECT unnest(string_split(s, ',')) AS e, k FROM t").fetchall()
    assert rows == [("a", 1), ("b", 1), ("c", 2),
                    ("d", 3), ("e", 3), ("f", 3)]


def test_array_length(con):
    assert con.sql("SELECT array_length(string_split(s, ',')) FROM t") \
        .fetchall() == [(2,), (1,), (3,)]


def test_list_contains(con):
    assert con.sql(
        "SELECT list_contains(string_split(s, ','), 'b') FROM t") \
        .fetchall() == [(True,), (False,), (False,)]


def test_list_aggregate(con):
    rows = con.sql("SELECT k % 2 AS g, list(s) FROM t GROUP BY g"
                   " ORDER BY g").fetchall()
    assert rows == [(0, ["c"]), (1, ["a,b", "d,e,f"])]


def test_list_aggregate_ungrouped(con):
    (v,), = con.sql("SELECT list(k) FROM t").fetchall()
    assert v == [1, 2, 3]


def test_string_agg(con):
    assert con.sql("SELECT string_agg(s, ';') FROM t").fetchall() \
        == [("a,b;c;d,e,f",)]


def test_string_agg_grouped(con):
    rows = con.sql("SELECT k % 2 AS g, string_agg(s, '|') FROM t"
                   " GROUP BY g ORDER BY g").fetchall()
    assert rows == [(0, "c"), (1, "a,b|d,e,f")]


def test_list_agg_mixed_with_plain(con):
    rows = con.sql("SELECT k % 2 AS g, count(*), sum(k), list(s)"
                   " FROM t GROUP BY g ORDER BY g").fetchall()
    assert rows == [(0, 1, 2, ["c"]), (1, 2, 4, ["a,b", "d,e,f"])]


def test_unnest_empty_result():
    c = Connection()
    c.sql("CREATE TABLE e (s VARCHAR)")
    assert c.sql("SELECT unnest(string_split(s, ',')) FROM e") \
        .fetchall() == []


def test_list_arrow_export(con):
    at = con.sql("SELECT list(k) AS l FROM t").arrow()
    assert at.column("l").to_pylist() == [[1, 2, 3]]
