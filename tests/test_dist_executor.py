"""Distributed SQL plan execution over the 8-device virtual mesh,
cross-checked against the single-device executor (BASELINE config-3
shape: join + aggregate pipelines with partitioned exchange)."""

import numpy as np
import pytest

import ddb_tpu
from ddb_tpu.plan import optimizer
from ddb_tpu.sql import parser as sqlparser
from ddb_tpu.sql.binder import Binder


@pytest.fixture(scope="module")
def mesh(eight_devices):
    from ddb_tpu.parallel.mesh import make_mesh
    return make_mesh(8)


@pytest.fixture(scope="module")
def con():
    rng = np.random.default_rng(5)
    n = 5000
    c = ddb_tpu.connect()
    c.register("fact", {
        "k": rng.integers(0, 200, n),
        "g": rng.integers(0, 8, n),
        "v": rng.integers(1, 100, n)})
    c.register("dim", {
        "k": np.arange(0, 150),
        "w": rng.integers(1, 10, 150)})
    return c


def run_both(con, mesh, sql):
    from ddb_tpu.parallel.executor import execute_distributed
    from ddb_tpu.api import QueryResult
    stmt = sqlparser.parse(sql)[0]
    plan = optimizer.optimize(
        Binder(con.catalog, context=con).bind_select(stmt))
    schema, batch = execute_distributed(plan, mesh)
    dist_rows = QueryResult(schema, batch).fetchall()
    single_rows = con.execute(sql).fetchall()
    return dist_rows, single_rows


def _norm(rows):
    return sorted(map(repr, rows))


def test_dist_groupby(con, mesh):
    d, s = run_both(con, mesh,
                    "SELECT g, sum(v), count(*), min(v), max(v), avg(v) "
                    "FROM fact GROUP BY g")
    assert _norm(d) == _norm(s)


def test_dist_groupby_highcard(con, mesh):
    d, s = run_both(con, mesh,
                    "SELECT k, sum(v) FROM fact GROUP BY k")
    assert _norm(d) == _norm(s)


def test_dist_filter_agg(con, mesh):
    d, s = run_both(con, mesh,
                    "SELECT g, sum(v) FROM fact WHERE v > 50 GROUP BY g")
    assert _norm(d) == _norm(s)


def test_dist_ungrouped(con, mesh):
    d, s = run_both(con, mesh,
                    "SELECT count(*), sum(v), min(k) FROM fact")
    assert _norm(d) == _norm(s)


def test_dist_join(con, mesh):
    d, s = run_both(con, mesh,
                    "SELECT fact.k, v, w FROM fact JOIN dim "
                    "ON fact.k = dim.k WHERE v < 10")
    assert _norm(d) == _norm(s)


def test_dist_join_agg_pipeline(con, mesh):
    d, s = run_both(con, mesh,
                    "SELECT g, sum(v * w) FROM fact JOIN dim "
                    "ON fact.k = dim.k GROUP BY g")
    assert _norm(d) == _norm(s)


def test_dist_semi_join(con, mesh):
    d, s = run_both(con, mesh,
                    "SELECT count(*) FROM fact WHERE k IN "
                    "(SELECT k FROM dim)")
    assert _norm(d) == _norm(s)


def test_dist_order_fallback(con, mesh):
    d, s = run_both(con, mesh,
                    "SELECT g, sum(v) AS sv FROM fact GROUP BY g "
                    "ORDER BY sv DESC LIMIT 3")
    assert d == s
