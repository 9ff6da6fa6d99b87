"""ClickBench subset validated differentially vs the reference oracle
on identical synthetic hits data (reference: benchmark/clickbench/)."""

import os

import pytest

import ddb_tpu
from ddb_tpu.bench import clickbench as cb
from ddb_tpu.bench.compare import compare_result

import oracle

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="oracle CLI not built")

N = int(os.environ.get("CLICKBENCH_TEST_ROWS", 50_000))


@pytest.fixture(scope="module")
def setup():
    cols = cb.generate(N)
    path = cb.write_csv(cols, "/tmp/cb_hits.csv")
    con = ddb_tpu.connect()
    cb.register(con, cols)
    init = (f"CREATE TABLE hits AS SELECT * FROM read_csv_auto"
            f"('{path}', nullstr='\\x00');")
    return con, init


@pytest.mark.parametrize("q", sorted(cb.QUERIES))
def test_clickbench(setup, q):
    con, init = setup
    sql = cb.QUERIES[q]
    # top-N with count ties is nondeterministic across engines: make the
    # comparison deterministic by ordering on ALL output columns after
    # the original keys (and by adding an order to LIMIT-only queries)
    if "LIMIT" in sql:
        head, tail = sql.rsplit("LIMIT", 1)
        head = head.strip()
        k = len(con.execute(f"SELECT * FROM ({head}) __t LIMIT 0"
                            ).column_names)
        ords = ", ".join(str(i + 1) for i in range(k))
        if "ORDER BY" in sql:
            sql_cmp = f"{head}, {ords} LIMIT {tail}"
        else:
            sql_cmp = (f"SELECT * FROM ({head}) __t ORDER BY {ords} "
                       f"LIMIT {tail}")
    else:
        sql_cmp = sql
    rows = con.execute(sql_cmp).fetchall()
    ref = oracle.query(sql_cmp, init)
    ok, msg = compare_result(rows, ref)
    assert ok, f"clickbench q{q}: {msg}"
