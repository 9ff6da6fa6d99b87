"""h2oai groupby suite validated differentially vs the reference oracle
on identical locally generated data (see ddb_tpu/bench/h2oai.py)."""

import os

import pytest

import ddb_tpu
from ddb_tpu.bench import h2oai
from ddb_tpu.bench.compare import compare_result

import oracle


pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="oracle CLI not built")

N = int(os.environ.get("H2OAI_TEST_ROWS", 100_000))


@pytest.fixture(scope="module")
def setup():
    cols = h2oai.generate(N, k=100, seed=7)
    csv_path = "/tmp/h2oai_test.csv"
    h2oai.write_csv(cols, csv_path)
    con = ddb_tpu.connect()
    h2oai.register(con, cols)
    init = (f"CREATE TABLE x_group AS SELECT * FROM "
            f"read_csv_auto('{csv_path}');")
    return con, init


@pytest.mark.parametrize("q", sorted(h2oai.QUERIES))
def test_h2oai_groupby(setup, q):
    con, init = setup
    sql = h2oai.QUERIES[q]
    if "GROUP BY" in sql:
        order_cols = sql.split("GROUP BY")[1].strip()
    else:
        order_cols = "id6, largest2_v3"       # q8 window top-2
    osql = f"SELECT * FROM ({sql}) t ORDER BY {order_cols}"
    rows = con.execute(osql).fetchall()
    ref = oracle.query(osql, init)
    ok, msg = compare_result(rows, ref)
    assert ok, f"h2oai q{q}: {msg}"


def test_h2oai_na_variant(setup):
    """NA variant: 5%% NULL v1 (h2oai G1 na_pct spec)."""
    cols = h2oai.generate(30_000, k=50, na_pct=5, seed=12)
    con = ddb_tpu.connect()
    h2oai.register(con, cols)
    csv_path = "/tmp/h2oai_na.csv"
    h2oai.write_csv(cols, csv_path)
    init = (f"CREATE TABLE x_group AS SELECT * FROM "
            f"read_csv_auto('{csv_path}');")
    sql = ("SELECT id1, sum(v1) AS v1, count(v1) AS n, count(*) AS c "
           "FROM x_group GROUP BY id1 ORDER BY id1")
    rows = con.execute(sql).fetchall()
    ref = oracle.query(sql, init)
    ok, msg = compare_result(rows, ref)
    assert ok, msg


def test_h2oai_skewed_keys(setup):
    """Skewed variant: 90% of rows in one group (BASELINE config 4)."""
    import numpy as np
    cols = h2oai.generate(50_000, k=10, seed=9)
    skew = np.random.default_rng(1).random(50_000) < 0.9
    cols["id1"] = np.where(skew, "id001", cols["id1"])
    con = ddb_tpu.connect()
    h2oai.register(con, cols)
    csv_path = "/tmp/h2oai_skew.csv"
    h2oai.write_csv(cols, csv_path)
    init = (f"CREATE TABLE x_group AS SELECT * FROM "
            f"read_csv_auto('{csv_path}');")
    sql = ("SELECT id1, sum(v1) AS v1, count(*) AS n FROM x_group "
           "GROUP BY id1 ORDER BY id1")
    rows = con.execute(sql).fetchall()
    ref = oracle.query(sql, init)
    ok, msg = compare_result(rows, ref)
    assert ok, msg
