#!/usr/bin/env python
"""Run the official TPC-H queries against a dbgen data directory and
validate bit-exact vs the reference answer sets.

Usage:
  python scripts/run_tpch.py --data /tmp/tpch/sf1 --sf sf1 [--queries 1,6]
  JAX_PLATFORMS=cpu python scripts/run_tpch.py ...   (CPU run)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ANSWERS = "/root/reference/extension/tpch/dbgen/answers"
QUERIES = "/root/reference/extension/tpch/dbgen/queries"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--sf", required=True, help="answer dir name e.g. sf1")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    # the axon sitecustomize overrides JAX_PLATFORMS=cpu from the env;
    # re-assert it through the config API before backend init
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        import jax
        jax.config.update("jax_platforms", "cpu")

    import ddb_tpu
    from ddb_tpu.bench.compare import compare_result
    from ddb_tpu.bench.tpch import load_tpch

    qs = [int(x) for x in args.queries.split(",")] if args.queries \
        else list(range(1, 23))

    t0 = time.perf_counter()
    con = ddb_tpu.connect()
    load_tpch(con, args.data)
    print(f"# load: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    results = {}
    all_ok = True
    for q in qs:
        sql = open(f"{QUERIES}/q{q:02d}.sql").read()
        try:
            t0 = time.perf_counter()
            rows = con.execute(sql).fetchall()
            t_first = time.perf_counter() - t0
            best = t_first
            for _ in range(args.repeat - 1):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            with open(f"{ANSWERS}/{args.sf}/q{q:02d}.csv") as f:
                f.readline()
                ref = [line.rstrip("\n").split("|") for line in f]
            ok, msg = compare_result(rows, ref)
            results[q] = {"ok": ok, "sec": round(best, 3),
                          "rows": len(rows)}
            if not ok:
                results[q]["error"] = msg[:200]
                all_ok = False
            print(f"q{q:02d}: {'PASS' if ok else 'FAIL'} {best:.3f}s"
                  + ("" if ok else f"  {msg[:150]}"), file=sys.stderr)
        except Exception as e:
            results[q] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            all_ok = False
            print(f"q{q:02d}: ERROR {type(e).__name__}: {str(e)[:150]}",
                  file=sys.stderr)
    print(json.dumps({"suite": f"tpch-{args.sf}", "all_ok": all_ok,
                      "results": {str(k): v for k, v in results.items()}}))
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
