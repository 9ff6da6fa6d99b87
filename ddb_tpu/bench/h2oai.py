"""h2oai db-benchmark groupby suite (reference: benchmark/h2oai/group/).

The reference pulls G1_* data over HTTP (zero-egress here), so data is
generated locally to the published spec — N rows, K id-cardinality
groups, skewed/NA variants — and correctness is validated differentially
against the reference duckdb CLI (oracle) on the SAME csv.
"""

from __future__ import annotations

import os

import numpy as np

# the 10 groupby queries (reference: benchmark/h2oai/group/queries/q*.sql,
# minus the TEMP TABLE wrapper)
QUERIES = {
    1: "SELECT id1, sum(v1) AS v1 FROM x_group GROUP BY id1",
    2: "SELECT id1, id2, sum(v1) AS v1 FROM x_group GROUP BY id1, id2",
    3: "SELECT id3, sum(v1) AS v1, avg(v3) AS v3 FROM x_group GROUP BY id3",
    4: "SELECT id4, avg(v1) AS v1, avg(v2) AS v2, avg(v3) AS v3 "
       "FROM x_group GROUP BY id4",
    5: "SELECT id6, sum(v1) AS v1, sum(v2) AS v2, sum(v3) AS v3 "
       "FROM x_group GROUP BY id6",
    6: "SELECT id4, id5, quantile_cont(v3, 0.5) AS median_v3, "
       "stddev(v3) AS sd_v3 FROM x_group GROUP BY id4, id5",
    7: "SELECT id3, max(v1)-min(v2) AS range_v1_v2 FROM x_group "
       "GROUP BY id3",
    8: "SELECT id6, v3 AS largest2_v3 FROM (SELECT id6, v3, "
       "row_number() OVER (PARTITION BY id6 ORDER BY v3 DESC) AS "
       "order_v3 FROM x_group WHERE v3 IS NOT NULL) sub_query "
       "WHERE order_v3 <= 2",
    9: "SELECT id2, id4, pow(corr(v1, v2), 2) AS r2 FROM x_group "
       "GROUP BY id2, id4",
    10: "SELECT id1, id2, id3, id4, id5, id6, sum(v3) AS v3, "
        "count(*) AS count FROM x_group "
        "GROUP BY id1, id2, id3, id4, id5, id6",
}


def generate(n: int, k: int = 100, na_pct: int = 0, seed: int = 108):
    """Generate h2oai G1-style columns (spec: id1-3 strings 'id###' with K
    (or N/K) cardinality, id4-6 ints, v1-2 small ints, v3 double)."""
    rng = np.random.default_rng(seed)
    big = max(n // k, 1)
    id1 = rng.integers(1, k + 1, n)
    id2 = rng.integers(1, k + 1, n)
    id3 = rng.integers(1, big + 1, n)
    id4 = rng.integers(1, k + 1, n).astype(np.int32)
    id5 = rng.integers(1, k + 1, n).astype(np.int32)
    id6 = rng.integers(1, big + 1, n).astype(np.int32)
    v1 = rng.integers(1, 6, n).astype(np.int32)
    v2 = rng.integers(1, 16, n).astype(np.int32)
    v3 = np.round(rng.uniform(0, 100, n), 6)
    cols = {
        "id1": np.array([f"id{v:03d}" for v in id1]),
        "id2": np.array([f"id{v:03d}" for v in id2]),
        "id3": np.array([f"id{v:010d}" for v in id3]),
        "id4": id4, "id5": id5, "id6": id6,
        "v1": v1, "v2": v2, "v3": v3,
    }
    if na_pct:
        mask = rng.random(n) < na_pct / 100.0
        cols["v1"] = cols["v1"].astype(object)
        cols["v1"][mask] = None
    return cols


def write_csv(cols, path: str):
    import pyarrow as pa
    import pyarrow.csv as pcsv
    at = pa.table({k: list(v) if v.dtype == object else v
                   for k, v in cols.items()})
    pcsv.write_csv(at, path)
    return path


def register(con, cols):
    import pyarrow as pa
    at = pa.table({k: list(v) if v.dtype == object else v
                   for k, v in cols.items()})
    con.register("x_group", at)
    return con
