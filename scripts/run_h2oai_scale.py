#!/usr/bin/env python
"""h2oai groupby at scale (BASELINE config 4: 1e8 rows, skewed keys).

Generates G1-style data fully vectorized (dictionary codes + small
string dictionaries — no per-row Python string formatting), runs the 10
groupby queries through ddb_tpu on CPU, computes the reference harness's
RESULT_QUERY checksums over each answer (reference:
benchmark/h2oai/group/q*.benchmark), and differentially validates them
against the oracle CLI on an identical CSV.

  python scripts/run_h2oai_scale.py --n 100000000 [--skew 1.1]
         [--queries 1,2,5] [--no-oracle] [--dist N]

--skew S draws id1/id2/id4/id5 group indices from a Zipf-like
distribution (p ~ 1/rank^S), exercising the distributed executor's
overflow-retry repartition backstop; --dist N additionally re-runs the
queries over an N-device virtual CPU mesh and reports the exchange
retry counters (parallel/executor.py STATS).
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ORACLE = "/tmp/ddbbuild/duckdb"

# reference harness checksum queries (benchmark/h2oai/group/q*.benchmark)
RESULT_QUERIES = {
    1: "SELECT COUNT(DISTINCT id1), SUM(v1), COUNT(*) FROM ans",
    2: "SELECT COUNT(DISTINCT id1), COUNT(DISTINCT id2), SUM(v1), "
       "COUNT(*) FROM ans",
    3: "SELECT COUNT(DISTINCT id3), SUM(v1), SUM(v3), COUNT(*) FROM ans",
    4: "SELECT COUNT(DISTINCT id4), SUM(v1), SUM(v2), SUM(v3), "
       "COUNT(*) FROM ans",
    5: "SELECT COUNT(DISTINCT id6), SUM(v1), SUM(v2), SUM(v3), "
       "COUNT(*) FROM ans",
    6: "SELECT COUNT(DISTINCT id4), COUNT(DISTINCT id5), "
       "SUM(median_v3), SUM(sd_v3), COUNT(*) FROM ans",
    7: "SELECT COUNT(DISTINCT id3), SUM(range_v1_v2), COUNT(*) FROM ans",
    8: "SELECT COUNT(DISTINCT id6), SUM(largest2_v3), COUNT(*) FROM ans",
    9: "SELECT COUNT(DISTINCT id2), COUNT(DISTINCT id4), SUM(r2), "
       "COUNT(*) FROM ans",
    10: "SELECT COUNT(DISTINCT id1), COUNT(DISTINCT id2), "
        "COUNT(DISTINCT id3), COUNT(DISTINCT id4), COUNT(DISTINCT id5), "
        "COUNT(DISTINCT id6), SUM(v3), SUM(count), COUNT(*) FROM ans",
}


def skewed_codes(rng, k, n, skew):
    if not skew:
        return rng.integers(0, k, n).astype(np.int32)
    ranks = np.arange(1, k + 1, dtype=np.float64)
    p = 1.0 / ranks ** skew
    p /= p.sum()
    return rng.choice(k, size=n, p=p).astype(np.int32)


def generate_scale(n, k=100, seed=108, skew=0.0):
    """G1-style columns as (codes, dict) pairs — vectorized."""
    rng = np.random.default_rng(seed)
    big = max(n // k, 1)
    d_small = np.array([f"id{i:03d}" for i in range(1, k + 1)])
    d_big = np.char.add("id", np.char.zfill(
        np.arange(1, big + 1).astype("U10"), 10))
    cols = {
        "id1": ("str", skewed_codes(rng, k, n, skew), d_small),
        "id2": ("str", skewed_codes(rng, k, n, skew), d_small),
        "id3": ("str", rng.integers(0, big, n).astype(np.int32), d_big),
        "id4": ("int", skewed_codes(rng, k, n, skew) + 1, None),
        "id5": ("int", skewed_codes(rng, k, n, skew) + 1, None),
        "id6": ("int", rng.integers(1, big + 1, n).astype(np.int32),
                None),
        "v1": ("int", rng.integers(1, 6, n).astype(np.int32), None),
        "v2": ("int", rng.integers(1, 16, n).astype(np.int32), None),
        "v3": ("dbl", np.round(rng.uniform(0, 100, n), 6), None),
    }
    return cols


def register_scale(con, cols):
    from ddb_tpu import types as T
    from ddb_tpu.storage.strings import StringDictionary
    from ddb_tpu.storage.table import TableColumn, TableData

    tcols = []
    for name, (kind, data, d) in cols.items():
        if kind == "str":
            tcols.append(TableColumn(name, T.VARCHAR,
                                     data.astype(np.int32),
                                     strdict=StringDictionary(d)))
        elif kind == "int":
            tcols.append(TableColumn(name, T.INTEGER,
                                     data.astype(np.int32)))
        else:
            tcols.append(TableColumn(name, T.DOUBLE, data))
    con.catalog.add_table(TableData("x_group", tcols), or_replace=True)


def write_csv_scale(cols, path):
    import pyarrow as pa
    import pyarrow.csv as pcsv
    arrs = {}
    for name, (kind, data, d) in cols.items():
        if kind == "str":
            arrs[name] = pa.DictionaryArray.from_arrays(
                pa.array(data), pa.array(d)).cast(pa.string())
        else:
            arrs[name] = pa.array(data)
    pcsv.write_csv(pa.table(arrs), path)


def oracle_checksums(csv_path, queries):
    from ddb_tpu.bench.h2oai import QUERIES
    out = {}
    for q in queries:
        sql = (f"CREATE TABLE x_group AS SELECT * FROM "
               f"read_csv_auto('{csv_path}');"
               f"CREATE TEMP TABLE ans AS {QUERIES[q]};"
               f"COPY ({RESULT_QUERIES[q]}) TO '/dev/stdout' "
               f"(FORMAT csv, HEADER false);")
        r = subprocess.run([ORACLE, "-c", sql], capture_output=True,
                           text=True, timeout=3600)
        if r.returncode != 0:
            out[q] = f"ORACLE ERROR: {r.stderr[-300:]}"
        else:
            out[q] = r.stdout.strip().splitlines()[-1]
    return out


def fmt_row(row):
    out = []
    for v in row:
        if v is None:
            out.append("")
        else:
            out.append(repr(v) if isinstance(v, float) else str(v))
    return ",".join(out)


def checksums_match(a: str, b: str, rtol=1e-9) -> bool:
    """Field-wise: ints exact, floats within rtol (summation order over
    1e8 doubles legitimately differs in the last ulps)."""
    fa, fb = a.split(","), b.split(",")
    if len(fa) != len(fb):
        return False
    for x, y in zip(fa, fb):
        if x == y:
            continue
        try:
            xv, yv = float(x), float(y)
        except ValueError:
            return False
        if not np.isclose(xv, yv, rtol=rtol, atol=1e-12):
            return False
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000_000)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--skew", type=float, default=0.0)
    ap.add_argument("--queries", default="1,2,3,4,5,6,7,8,9,10")
    ap.add_argument("--no-oracle", action="store_true")
    ap.add_argument("--dist", type=int, default=0,
                    help="re-run over an N-device virtual mesh")
    args = ap.parse_args()
    queries = [int(x) for x in args.queries.split(",")]

    if args.dist:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.dist}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import ddb_tpu
    from ddb_tpu.bench.h2oai import QUERIES

    t0 = time.time()
    cols = generate_scale(args.n, args.k, skew=args.skew)
    print(f"generated {args.n} rows in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)

    con = ddb_tpu.connect()
    register_scale(con, cols)

    ours = {}
    timings = {}
    for q in queries:
        t0 = time.time()
        con.execute(f"CREATE OR REPLACE TEMP TABLE ans AS {QUERIES[q]}")
        rows = con.execute(
            RESULT_QUERIES[q].replace("FROM ans", "FROM ans")).fetchall()
        timings[q] = round(time.time() - t0, 2)
        ours[q] = fmt_row(rows[0])
        con.execute("DROP TABLE ans")
        print(f"q{q:02d} ddb_tpu {timings[q]}s -> {ours[q]}",
              file=sys.stderr, flush=True)

    result = {"n": args.n, "skew": args.skew, "ours": ours,
              "timings_s": timings}

    if args.dist:
        from ddb_tpu.parallel import executor as EX
        from ddb_tpu.parallel.mesh import make_mesh
        from ddb_tpu.sql import parser as P
        from ddb_tpu.sql.binder import Binder
        EX.STATS["exchange_retries"] = 0
        EX.STATS["exchange_overflow_rows"] = 0
        mesh = make_mesh(args.dist)
        dist_ok = {}
        for q in queries:
            try:
                plan = con._optimize(Binder(con.catalog, context=con)
                                     .bind_select(P.parse(QUERIES[q])[0]))
                sd, bd = EX.execute_distributed(plan, mesh)
                rows = int(np.asarray(bd.count))
                dist_ok[q] = f"ran ({rows} groups)"
            except Exception as ex:
                dist_ok[q] = f"fallback: {type(ex).__name__}: {ex}"
        result["dist"] = {"devices": args.dist, "status": dist_ok,
                          "exchange_stats": dict(EX.STATS)}

    if not args.no_oracle and os.path.exists(ORACLE):
        csv_path = "/tmp/h2oai_scale.csv"
        t0 = time.time()
        write_csv_scale(cols, csv_path)
        print(f"csv written in {time.time()-t0:.1f}s", file=sys.stderr,
              flush=True)
        del cols
        orc = oracle_checksums(csv_path, queries)
        result["oracle"] = orc
        result["match"] = {q: checksums_match(ours[q], orc[q])
                           for q in queries}

    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
