#!/usr/bin/env python
"""TPC-DS differential runner: our engine vs the reference oracle CLI.

Usage: python scripts/run_tpcds.py [--sf 0.01] [--queries 1-99]
Runs in CHUNKS of separate subprocesses (many distinct query shapes in one
jax process exhaust vm.max_map_count with compiled executables).

Data: oracle `CALL dsdgen(sf=N); EXPORT DATABASE '/tmp/tpcds/sfN' (FORMAT
csv, DELIMITER '|', HEADER false)` + a /tmp/tpcds/sfN.duckdb for the
oracle side (reference: extension/tpcds/).
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
ORACLE = os.environ.get("DDB_ORACLE", "/tmp/ddbbuild/duckdb")

CHILD = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
from ddb_tpu import Connection
from ddb_tpu.bench.tpcds import load_tpcds, query_text
import decimal, datetime

con = Connection()
load_tpcds(con, %(datadir)r)

def norm(v):
    if v is None: return ""
    if isinstance(v, bool): return "true" if v else "false"
    if isinstance(v, float): return "%%.3f" %% v
    if isinstance(v, decimal.Decimal): return "%%.3f" %% float(v)
    if isinstance(v, datetime.datetime):
        return v.strftime("%%Y-%%m-%%d %%H:%%M:%%S")
    if isinstance(v, datetime.date): return v.isoformat()
    return str(v)

import signal
class _Timeout(Exception):
    pass
def _alarm(sig, frm):
    raise _Timeout()
signal.signal(signal.SIGALRM, _alarm)
out = {}
for q in %(queries)r:
    signal.alarm(%(per_query)d)
    try:
        rows = con.sql(query_text(q)).fetchall()
        out[q] = [[norm(v) for v in r] for r in rows]
    except _Timeout:
        out[q] = "ERROR Timeout"
    except Exception as e:
        out[q] = "ERROR " + type(e).__name__ + ": " + str(e)[:120]
    finally:
        signal.alarm(0)
    json.dump(out, open(%(outfile)r, "w"))
"""


def oracle_rows(sql: str, dbfile: str):
    import csv
    import io
    out = subprocess.run(
        [ORACLE, "-batch", dbfile],
        input=".mode csv\n.headers off\n" + sql.rstrip().rstrip(";") + ";",
        capture_output=True, text=True, timeout=600)
    if out.returncode != 0:
        return None, out.stderr[:150]
    return [[cell_norm(c) for c in r]
            for r in csv.reader(io.StringIO(out.stdout))], None


def cell_norm(s: str) -> str:
    """Symmetric cell normalization for comparison: numbers to 3 decimal
    places, NULL spellings to ''."""
    if s in ("NULL", ""):
        return ""
    try:
        return "%.3f" % float(s)
    except (ValueError, TypeError):
        return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.01")
    ap.add_argument("--queries", default="1-99")
    ap.add_argument("--chunk", type=int, default=6)
    ap.add_argument("--per-query", type=int, default=300)
    args = ap.parse_args()

    datadir = f"/tmp/tpcds/sf{args.sf}"
    dbfile = f"/tmp/tpcds/sf{args.sf}.duckdb"
    if not os.path.isdir(datadir):
        os.makedirs("/tmp/tpcds", exist_ok=True)
        subprocess.run([ORACLE], input=(
            f"CALL dsdgen(sf={args.sf}); EXPORT DATABASE '{datadir}' "
            "(FORMAT csv, DELIMITER '|', HEADER false);"),
            text=True, check=True, capture_output=True)
    if not os.path.exists(dbfile):
        subprocess.run([ORACLE, dbfile], input=f"CALL dsdgen(sf={args.sf});",
                       text=True, check=True, capture_output=True)

    if "," in args.queries:
        queries = [int(q) for q in args.queries.split(",")]
    else:
        lo, hi = (args.queries.split("-") + [args.queries])[:2]
        queries = list(range(int(lo), int(hi) + 1))

    os.makedirs("/tmp/tpcds_results", exist_ok=True)
    mine = {}
    todo = []
    for q in queries:
        cached = f"/tmp/tpcds_results/q{q}.json"
        if os.path.exists(cached):
            mine[q] = json.load(open(cached))
        else:
            todo.append(q)
    for i in range(0, len(todo), args.chunk):
        chunk = todo[i:i + args.chunk]
        outfile = f"/tmp/tpcds_out_{i}.json"
        code = CHILD % {"repo": REPO, "datadir": datadir,
                        "queries": chunk, "outfile": outfile,
                        "per_query": args.per_query}
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True,
                timeout=args.per_query * len(chunk) + 600)
        except subprocess.TimeoutExpired:
            r = None
        got = {}
        if os.path.exists(outfile):
            got = {int(k): v for k, v in json.load(open(outfile)).items()}
            os.unlink(outfile)
        for q in chunk:
            v = got.get(q)
            if v is None:
                err_tail = (r.stderr[-150:] if r is not None
                            and r.returncode != 0 else "chunk timeout")
                v = "ERROR chunk: " + err_tail
            mine[q] = v
            json.dump(v, open(f"/tmp/tpcds_results/q{q}.json", "w"))
        sys.stderr.write(f"ran {i + len(chunk)}/{len(todo)}\n")
        sys.stderr.flush()

    from ddb_tpu.bench.tpcds import query_text
    ok, diff, err = [], [], {}
    for q in queries:
        m = mine.get(q)
        if isinstance(m, str):
            err[q] = m
            continue
        m = [[cell_norm(c) for c in r] for r in m]
        theirs, oerr = oracle_rows(query_text(q), dbfile)
        if theirs is None:
            err[q] = "oracle: " + oerr
            continue
        (ok if m == theirs else diff).append(q)

    print(f"MATCH {len(ok)}/{len(queries)}: {ok}")
    print(f"DIFF  {len(diff)}: {diff}")
    for q in sorted(err):
        print(f"ERR q{q}: {err[q][:120]}")
    json.dump({"match": ok, "diff": diff,
               "errors": {str(k): v for k, v in err.items()}},
              open("/tmp/tpcds_report.json", "w"), indent=1)


if __name__ == "__main__":
    main()
