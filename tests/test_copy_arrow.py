"""COPY TO/FROM + arrow/numpy export (reference: physical_copy_to_file,
arrow interop in common/arrow/)."""

import decimal

import numpy as np
import pytest

import ddb_tpu


def test_copy_roundtrip_csv(tmp_path):
    p = str(tmp_path / "out.csv")
    con = ddb_tpu.connect()
    con.execute("CREATE TABLE t (a INTEGER, s VARCHAR)")
    con.execute("INSERT INTO t VALUES (1, 'x'), (2, 'y')")
    con.execute(f"COPY t TO '{p}'")
    con.execute("CREATE TABLE t2 (a INTEGER, s VARCHAR)")
    con.execute(f"COPY t2 FROM '{p}'")
    assert con.execute("SELECT * FROM t2 ORDER BY a").fetchall() == \
        [(1, "x"), (2, "y")]


def test_copy_query_parquet(tmp_path):
    p = str(tmp_path / "out.parquet")
    con = ddb_tpu.connect()
    con.register("t", {"a": [3, 1, 2]})
    con.execute(f"COPY (SELECT a * 10 AS b FROM t WHERE a > 1) TO '{p}'")
    import pyarrow.parquet as pq
    at = pq.read_table(p)
    assert sorted(at.column("b").to_pylist()) == [20, 30]


def test_arrow_export_types():
    import datetime
    import pyarrow as pa
    con = ddb_tpu.connect()
    con.execute("CREATE TABLE t (a INTEGER, s VARCHAR, d DECIMAL(10,2))")
    con.execute("INSERT INTO t VALUES (1, 'x', 1.25), (2, NULL, NULL)")
    at = con.execute("SELECT * FROM t ORDER BY a").arrow()
    assert at.column("a").to_pylist() == [1, 2]
    assert at.column("s").to_pylist() == ["x", None]
    assert at.column("d").to_pylist() == [decimal.Decimal("1.25"), None]


def test_fetchnumpy():
    con = ddb_tpu.connect()
    con.register("t", {"a": [1, 2, 3]})
    d = con.execute("SELECT a FROM t").fetchnumpy()
    assert list(d["a"]) == [1, 2, 3]


def test_window_rank_fns():
    con = ddb_tpu.connect()
    con.register("t", {"x": [1, 2, 2, 4]})
    rows = con.execute(
        "SELECT x, percent_rank() OVER (ORDER BY x), "
        "cume_dist() OVER (ORDER BY x), ntile(2) OVER (ORDER BY x) "
        "FROM t ORDER BY x").fetchall()
    assert rows[0][1] == 0.0 and rows[3][1] == 1.0
    assert rows[3][2] == 1.0 and abs(rows[2][2] - 0.75) < 1e-12
    assert [r[3] for r in rows] == [1, 1, 2, 2]
