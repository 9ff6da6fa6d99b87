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


# ---- round-3 coverage: outer/mark/multi-cond joins, order, distinct -----

@pytest.fixture(scope="module")
def ncon():
    """Tables with NULL join keys to exercise outer/mark semantics."""
    rng = np.random.default_rng(11)
    n = 3000
    k = rng.integers(0, 120, n).astype(float)
    k[rng.random(n) < 0.1] = np.nan   # -> NULL via register
    c = ddb_tpu.connect()
    c.register("lf", {
        "k": [None if np.isnan(x) else int(x) for x in k],
        "g": rng.integers(0, 6, n),
        "v": rng.integers(1, 50, n)})
    rk = list(range(0, 90)) + [None, None]
    c.register("rt", {
        "k": rk,
        "w": list(rng.integers(1, 9, len(rk)))})
    return c


def test_dist_left_join(ncon, mesh):
    d, s = run_both(ncon, mesh,
                    "SELECT lf.k, v, w FROM lf LEFT JOIN rt "
                    "ON lf.k = rt.k")
    assert _norm(d) == _norm(s)


def test_dist_right_join(ncon, mesh):
    d, s = run_both(ncon, mesh,
                    "SELECT lf.k, v, rt.k, w FROM lf RIGHT JOIN rt "
                    "ON lf.k = rt.k")
    assert _norm(d) == _norm(s)


def test_dist_full_join(ncon, mesh):
    d, s = run_both(ncon, mesh,
                    "SELECT lf.k, v, rt.k, w FROM lf FULL JOIN rt "
                    "ON lf.k = rt.k")
    assert _norm(d) == _norm(s)


def test_dist_anti_join_nulls(ncon, mesh):
    d, s = run_both(ncon, mesh,
                    "SELECT count(*) FROM lf WHERE NOT EXISTS "
                    "(SELECT 1 FROM rt WHERE rt.k = lf.k)")
    assert _norm(d) == _norm(s)


def test_dist_mark_join_not_in(ncon, mesh):
    # 3-valued NOT IN over a build side containing NULLs
    d, s = run_both(ncon, mesh,
                    "SELECT count(*) FROM lf WHERE k NOT IN "
                    "(SELECT k FROM rt WHERE k < 40)")
    assert _norm(d) == _norm(s)


def test_dist_multi_cond_join(con, mesh):
    d, s = run_both(con, mesh,
                    "SELECT fact.k, v, w FROM fact JOIN dim "
                    "ON fact.k = dim.k AND fact.g = dim.w")
    assert _norm(d) == _norm(s)


def test_dist_join_residual(con, mesh):
    d, s = run_both(con, mesh,
                    "SELECT fact.k, v, w FROM fact JOIN dim "
                    "ON fact.k = dim.k AND v > w * 3")
    assert _norm(d) == _norm(s)


def test_dist_order_distributed(con, mesh):
    d, s = run_both(con, mesh,
                    "SELECT k, g, v FROM fact ORDER BY v DESC, k, g")
    assert d == s


def test_dist_order_nulls(ncon, mesh):
    d, s = run_both(ncon, mesh,
                    "SELECT k, v FROM lf ORDER BY k NULLS FIRST, v")
    assert d == s


def test_dist_distinct(con, mesh):
    d, s = run_both(con, mesh, "SELECT DISTINCT g FROM fact")
    assert _norm(d) == _norm(s)


def test_dist_no_gather_for_joins_order(con, ncon, mesh, monkeypatch):
    """The battery above must run WITHOUT the gathered fallback for
    joins and order (VERDICT round-3 criterion)."""
    from ddb_tpu.parallel import executor as ex
    calls = []
    orig = ex._exec_gathered

    def spy(node, ctx):
        calls.append(type(node).__name__)
        return orig(node, ctx)

    monkeypatch.setattr(ex, "_exec_gathered", spy)
    run_both(con, mesh,
             "SELECT fact.k, v, w FROM fact LEFT JOIN dim "
             "ON fact.k = dim.k ORDER BY v, fact.k, w")
    assert "Join" not in calls and "Order" not in calls


def test_dist_distinct_aggregates(con, mesh):
    """DISTINCT aggregates run distributed via raw-row exchange
    (reference: distinct_aggregate_data.cpp re-partitioning)."""
    d, s = run_both(con, mesh,
                    "SELECT g, count(DISTINCT v), sum(DISTINCT v) "
                    "FROM fact GROUP BY g")
    assert _norm(d) == _norm(s)


def test_dist_median_quantile(con, mesh):
    d, s = run_both(con, mesh,
                    "SELECT g, median(v), quantile_disc(v, 0.25) "
                    "FROM fact GROUP BY g")
    assert _norm(d) == _norm(s)


def test_dist_arg_minmax_mode(con, mesh):
    # unique BY values (v*1000+k) make arg extrema deterministic —
    # ties are picked arbitrarily on both paths otherwise
    d, s = run_both(con, mesh,
                    "SELECT g, arg_max(k, v*1000+k), "
                    "arg_min(k, v*1000+k), mode(v) "
                    "FROM fact GROUP BY g")
    assert _norm(d) == _norm(s)


def test_dist_mixed_plain_and_distinct(con, mesh):
    d, s = run_both(con, mesh,
                    "SELECT g, sum(v), count(DISTINCT k), avg(v) "
                    "FROM fact GROUP BY g")
    assert _norm(d) == _norm(s)


def test_dist_window_partitioned(con, mesh):
    """Window fns exchange on PARTITION BY keys and run shard-local."""
    d, s = run_both(con, mesh,
                    "SELECT k, v, row_number() OVER "
                    "(PARTITION BY g ORDER BY v, k), "
                    "sum(v) OVER (PARTITION BY g) FROM fact")
    assert _norm(d) == _norm(s)


def test_dist_window_rank_lag(con, mesh):
    d, s = run_both(con, mesh,
                    "SELECT g, v, rank() OVER w, lag(v) OVER w "
                    "FROM fact WINDOW w AS "
                    "(PARTITION BY g ORDER BY v, k)")
    assert _norm(d) == _norm(s)


def test_dist_topn(con, mesh):
    """LIMIT over ORDER BY: per-shard local top-k, tiny gather-merge."""
    d, s = run_both(con, mesh,
                    "SELECT k, v FROM fact ORDER BY v DESC, k LIMIT 7")
    assert d == s      # ordered comparison


def test_dist_topn_offset(con, mesh):
    d, s = run_both(con, mesh,
                    "SELECT k, v FROM fact ORDER BY v, k "
                    "LIMIT 5 OFFSET 3")
    assert d == s


def test_exchange_overflow_retry_on_skew():
    """One dominant key overflows a shard's initial exchange capacity;
    the doubling retry backstop (parallel/executor.py STATS) must fire
    and the result must stay exact (BASELINE config 4 skew-aware
    repartition evidence)."""
    import numpy as np

    import ddb_tpu
    from ddb_tpu.api import QueryResult
    from ddb_tpu.parallel import executor as EX
    from ddb_tpu.parallel.mesh import make_mesh
    from ddb_tpu.sql import parser as P
    from ddb_tpu.sql.binder import Binder

    con = ddb_tpu.connect()
    n = 4096
    g = np.where(np.arange(n) < n - 64, 7, np.arange(n) % 50)
    con.register("skew_t", {"g": g, "v": np.arange(n)})
    before = EX.STATS["exchange_retries"]
    plan = con._optimize(Binder(con.catalog, context=con).bind_select(
        P.parse("select g, count(distinct v) from skew_t group by g")[0]))
    sd, bd = EX.execute_distributed(plan, make_mesh(8))
    assert EX.STATS["exchange_retries"] > before
    ref = con.execute(
        "select g, count(distinct v) from skew_t group by g").fetchall()
    assert sorted(QueryResult(sd, bd).fetchall()) == sorted(ref)


def test_dist_plain_limit(con, mesh):
    # LIMIT/OFFSET without ORDER BY stays sharded: global prefix count
    # via all_gather of per-shard totals (reference: PhysicalLimit's
    # shared row counter, physical_limit.cpp)
    d, s = run_both(con, mesh, "SELECT k, v FROM fact LIMIT 37")
    assert len(d) == len(s) == 37
    d, s = run_both(con, mesh,
                    "SELECT k FROM fact WHERE v > 50 LIMIT 100000")
    assert len(d) == len(s)
    d, s = run_both(con, mesh, "SELECT k FROM fact LIMIT 10 OFFSET 25")
    assert len(d) == len(s) == 10
    # row-set equality needs a deterministic query: count them instead
    d, s = run_both(con, mesh,
                    "SELECT count(*) FROM (SELECT k FROM fact "
                    "LIMIT 4990 OFFSET 5)")
    assert d == s == [(4990,)]
