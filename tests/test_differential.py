"""Differential testing vs the reference oracle on shared random data.

The TPU-native equivalent of the reference's statement-verifier strategy
(reference: src/verification/statement_verifier.hpp — run the same query
multiple ways and diff): here the second way is the reference engine
itself, which doubles as a semantics oracle for NULLs, strings, dates,
joins and windows."""

import os

import numpy as np
import pytest

import ddb_tpu
from ddb_tpu.bench.compare import compare_result

import oracle

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="oracle CLI not built")

SEED = 20260817
N = 2_000


def _gen():
    rng = np.random.default_rng(SEED)
    a = rng.integers(-50, 50, N)
    b = rng.integers(0, 10, N)
    f = np.round(rng.normal(0, 100, N), 4)
    s = rng.choice(["alpha", "beta", "gamma", "delta", ""], N)
    d = rng.integers(8000, 12000, N)   # days since epoch
    null_a = rng.random(N) < 0.1
    null_s = rng.random(N) < 0.1
    return a, b, f, s, d, null_a, null_s


def _csv(path):
    import csv
    a, b, f, s, d, na, ns = _gen()
    import datetime
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["a", "b", "f", "s", "d"])
        for i in range(N):
            w.writerow([
                "" if na[i] else int(a[i]), int(b[i]), repr(float(f[i])),
                "" if ns[i] else s[i],
                (datetime.date(1970, 1, 1)
                 + datetime.timedelta(days=int(d[i]))).isoformat()])
    return path


@pytest.fixture(scope="module")
def both():
    path = _csv("/tmp/diff_test.csv")
    con = ddb_tpu.connect()
    con.read_csv("t", path)
    init = (f"CREATE TABLE t AS SELECT * FROM read_csv_auto"
            f"('{path}', nullstr='');")
    return con, init


QUERIES = [
    "SELECT count(*), count(a), count(s) FROM t",
    "SELECT sum(a), min(a), max(a), round(avg(a), 6) FROM t",
    "SELECT b, count(*) FROM t GROUP BY b ORDER BY b",
    "SELECT b, sum(a), min(s) FROM t GROUP BY b ORDER BY b",
    "SELECT s, count(*) FROM t GROUP BY s ORDER BY s NULLS FIRST",
    "SELECT count(DISTINCT b), count(DISTINCT s) FROM t",
    "SELECT a, b FROM t WHERE a > 40 ORDER BY a, b LIMIT 20",
    "SELECT a FROM t WHERE a IS NULL LIMIT 5",
    "SELECT count(*) FROM t WHERE s LIKE '%et%'",
    "SELECT count(*) FROM t WHERE s IN ('alpha', 'gamma')",
    "SELECT count(*) FROM t WHERE a BETWEEN -10 AND 10",
    "SELECT count(*) FROM t WHERE d >= DATE '1997-01-01'",
    "SELECT year(d) AS y, count(*) FROM t GROUP BY y ORDER BY y",
    "SELECT CASE WHEN a > 0 THEN 'pos' WHEN a < 0 THEN 'neg' "
    "ELSE 'zero' END AS c2, count(*) FROM t GROUP BY c2 ORDER BY c2",
    "SELECT b, sum(CASE WHEN a > 0 THEN a ELSE 0 END) FROM t "
    "GROUP BY b ORDER BY b",
    "SELECT t1.b, count(*) FROM t t1 JOIN t t2 ON t1.a = t2.a "
    "GROUP BY t1.b ORDER BY t1.b",
    "SELECT count(*) FROM t t1 LEFT JOIN "
    "(SELECT a, count(*) c FROM t GROUP BY a) t2 ON t1.a = t2.a "
    "WHERE t2.c IS NULL",
    "SELECT count(*) FROM t WHERE a IN (SELECT b FROM t)",
    "SELECT count(*) FROM t WHERE EXISTS "
    "(SELECT 1 FROM t t2 WHERE t2.b = t.a)",
    "SELECT b, count(*) FROM t WHERE a > (SELECT avg(b) FROM t) "
    "GROUP BY b ORDER BY b",
    "SELECT DISTINCT b FROM t WHERE b < 5 ORDER BY b",
    "SELECT upper(s) u, count(*) FROM t WHERE s IS NOT NULL "
    "GROUP BY u ORDER BY u",
    "SELECT substring(s, 1, 2) p, count(*) FROM t WHERE s <> '' "
    "GROUP BY p ORDER BY p",
    "SELECT length(s) l, count(*) FROM t WHERE s IS NOT NULL "
    "GROUP BY l ORDER BY l",
    "SELECT b, max(a) - min(a) FROM t GROUP BY b HAVING count(*) > 50 "
    "ORDER BY b",
    "SELECT sum(a * b), sum(a + b), sum(a - b) FROM t WHERE a IS NOT NULL",
    "SELECT a FROM t WHERE b = 3 ORDER BY a DESC NULLS LAST LIMIT 10",
    "SELECT b FROM t GROUP BY b ORDER BY count(*) DESC, b LIMIT 3",
    "SELECT b, round(avg(f), 8) FROM t GROUP BY b ORDER BY b",
    "SELECT b FROM t EXCEPT SELECT a FROM t WHERE a > 5 ORDER BY b",
    "SELECT b FROM t WHERE b < 3 UNION SELECT b FROM t WHERE b > 7 "
    "ORDER BY b",
    "SELECT coalesce(a, 0) c3, count(*) FROM t WHERE b = 1 "
    "GROUP BY c3 ORDER BY c3 LIMIT 10",
    "SELECT b, row_number() OVER (ORDER BY b, a NULLS LAST, f) rn "
    "FROM t WHERE b = 9 AND a IS NOT NULL ORDER BY rn LIMIT 10",
    "SELECT abs(a) ab, count(*) FROM t WHERE a IS NOT NULL "
    "GROUP BY ab ORDER BY ab LIMIT 10",
    "SELECT round(stddev_samp(f), 8), round(var_pop(f), 8) FROM t",
    "SELECT b, round(stddev_pop(a), 8) FROM t WHERE a IS NOT NULL "
    "GROUP BY b ORDER BY b",
    "SELECT round(corr(a, b), 10), round(covar_samp(a, b), 10) FROM t "
    "WHERE a IS NOT NULL",
    "SELECT median(b), quantile_cont(b, 0.25) FROM t",
    "SELECT b, median(a) FROM t WHERE a IS NOT NULL GROUP BY b "
    "ORDER BY b",
    "SELECT quantile_disc(a, 0.9) FROM t WHERE a IS NOT NULL",
    "SELECT bool_and(a > -100), bool_or(a > 49) FROM t "
    "WHERE a IS NOT NULL",
    "SELECT round(sum(ln(b + 1)), 8), round(sum(sqrt(b)), 8) FROM t",
    "SELECT round(sum(pow(b, 2)), 4) FROM t",
    "SELECT least(a, b) l2, greatest(a, b) g2 FROM t "
    "WHERE a IS NOT NULL ORDER BY l2, g2 LIMIT 5",
    "SELECT count(*) FROM t WHERE nullif(b, 5) IS NULL",
    "SELECT sum(ifnull(a, 0)) FROM t",
    "SELECT date_trunc('month', d) m2, count(*) FROM t "
    "GROUP BY m2 ORDER BY m2 LIMIT 6",
    "SELECT quarter(d) q2, count(*) FROM t GROUP BY q2 ORDER BY q2",
    "SELECT dayofweek(d) w2, count(*) FROM t GROUP BY w2 ORDER BY w2",
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_differential(both, qi):
    con, init = both
    sql = QUERIES[qi]
    rows = con.execute(sql).fetchall()
    ref = oracle.query(sql, init)
    ok, msg = compare_result(rows, ref)
    assert ok, f"query {qi}: {sql}\n{msg}"
