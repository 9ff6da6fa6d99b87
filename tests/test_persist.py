"""Native single-file persistence (native/dtbfile.cpp + storage/persist.py;
reference counterpart: single-file checkpoint, test/persistence)."""

import decimal
import os

import pytest

import ddb_tpu


def test_save_load_roundtrip(tmp_path):
    path = str(tmp_path / "db.dtb")
    con = ddb_tpu.connect()
    con.execute("CREATE TABLE t (a INTEGER, s VARCHAR, d DECIMAL(10,2))")
    con.execute("INSERT INTO t VALUES (1, 'hello', 1.25), "
                "(2, NULL, 2.50), (3, 'world', NULL)")
    con.execute("CREATE VIEW v AS SELECT a FROM t WHERE a > 1")
    con.save(path)

    con2 = ddb_tpu.connect(path)
    rows = con2.execute("SELECT * FROM t ORDER BY a").fetchall()
    assert rows == [(1, "hello", decimal.Decimal("1.25")),
                    (2, None, decimal.Decimal("2.50")),
                    (3, "world", None)]
    assert con2.execute("SELECT count(*) FROM v").fetchall() == [(2,)]


def test_atomic_overwrite(tmp_path):
    path = str(tmp_path / "db.dtb")
    con = ddb_tpu.connect()
    con.execute("CREATE TABLE t (a INTEGER)")
    con.execute("INSERT INTO t VALUES (1)")
    con.save(path)
    con.execute("INSERT INTO t VALUES (2)")
    con.save(path)     # atomic replace
    con2 = ddb_tpu.connect(path)
    assert con2.execute("SELECT count(*) FROM t").fetchall() == [(2,)]


def test_corruption_detected(tmp_path):
    path = str(tmp_path / "db.dtb")
    con = ddb_tpu.connect()
    con.execute("CREATE TABLE t (a INTEGER)")
    con.execute("INSERT INTO t VALUES (42)")
    con.save(path)
    # flip a byte in the blob region
    data = bytearray(open(path, "rb").read())
    data[-2] ^= 0xFF
    open(path, "wb").write(bytes(data))
    con2 = ddb_tpu.connect()
    with pytest.raises(IOError):
        con2.load(path)


def test_missing_file():
    con = ddb_tpu.connect()
    with pytest.raises(IOError):
        con.load("/tmp/definitely_missing.dtb")
