#!/usr/bin/env python
"""Triage the reference's sqllogictest corpus against this engine.

Walks test/sql/** directories, runs every .test file through
ddb_tpu.testing.sqllogic in chunked subprocesses (fresh engine state per
file, per-file timeout), then writes:
  - tests/sqllogic_allowlist.txt  — files that pass fully (checked in;
    tests/test_sqllogic.py parametrizes over it)
  - /tmp/sqllogic_triage.json     — full pass/fail detail for analysis

Usage: python scripts/triage_sqllogic.py [--dirs aggregate join ...]
       [--chunk 40] [--per-file 45] [--merge]
--merge keeps existing allowlist entries that still pass.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

DEFAULT_DIRS = [
    "aggregate", "join", "order", "select", "filter", "limit", "cte",
    "update", "delete", "insert", "projection", "window", "subquery",
    "setops", "cast", "conjunction", "types/null", "types/date",
    "types/time", "types/timestamp", "types/decimal", "types/interval",
    "types/string", "types/varchar", "types/blob", "types/boolean",
    "types/enum", "types/list", "types/struct", "types/map",
    "function/string", "function/numeric", "function/date",
    "function/generic", "function/list",
]

CHILD = r"""
import os, sys, json, signal, traceback
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
import ddb_tpu
from ddb_tpu.testing.sqllogic import run_file

class _T(Exception): pass
def _alarm(s, f): raise _T()
signal.signal(signal.SIGALRM, _alarm)

out = {}
for rel in %(files)r:
    signal.alarm(%(per_file)d)
    try:
        con = ddb_tpu.connect()
        r = run_file(con, os.path.join(%(ref)r, rel))
        if r.skipped_reason is not None:
            out[rel] = ["skip", r.skipped_reason[:120]]
        elif r.failures:
            out[rel] = ["fail", r.failures[0][:200], len(r.failures),
                        r.ran]
        elif r.ran == 0:
            out[rel] = ["skip", "no statements ran"]
        else:
            out[rel] = ["pass", r.ran]
    except _T:
        out[rel] = ["timeout"]
    except Exception as e:
        out[rel] = ["error", type(e).__name__ + ": " + str(e)[:200]]
    finally:
        signal.alarm(0)
    json.dump(out, open(%(outfile)r, "w"))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", nargs="*", default=DEFAULT_DIRS)
    ap.add_argument("--chunk", type=int, default=40)
    ap.add_argument("--per-file", type=int, default=45)
    ap.add_argument("--merge", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="skip files already in the triage json")
    args = ap.parse_args()

    files = []
    for d in args.dirs:
        base = os.path.join(REF, "test", "sql", d)
        for root, _dirs, fns in os.walk(base):
            for fn in sorted(fns):
                if fn.endswith(".test"):
                    files.append(os.path.relpath(
                        os.path.join(root, fn), REF))
    files = sorted(set(files))
    print(f"{len(files)} candidate files", file=sys.stderr)

    results = {}
    tri_path = "/tmp/sqllogic_triage.json"
    if args.resume and os.path.exists(tri_path):
        results = json.load(open(tri_path))
        files = [f for f in files if f not in results]
        print(f"resume: {len(files)} left", file=sys.stderr)

    for i in range(0, len(files), args.chunk):
        chunk = files[i:i + args.chunk]
        outfile = f"/tmp/sqllogic_chunk_{i}.json"
        code = CHILD % {"repo": REPO, "ref": REF, "files": chunk,
                        "per_file": args.per_file, "outfile": outfile}
        try:
            subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=args.per_file * len(chunk) + 300)
        except subprocess.TimeoutExpired:
            pass
        got = {}
        if os.path.exists(outfile):
            got = json.load(open(outfile))
            os.unlink(outfile)
        for rel in chunk:
            results[rel] = got.get(rel, ["crash"])
        json.dump(results, open(tri_path, "w"), indent=0)
        npass = sum(1 for v in results.values() if v[0] == "pass")
        print(f"[{i + len(chunk)}/{len(files)}] pass={npass}",
              file=sys.stderr)

    passing = sorted(r for r, v in results.items() if v[0] == "pass")
    allow_path = os.path.join(REPO, "tests", "sqllogic_allowlist.txt")
    if args.merge and os.path.exists(allow_path):
        old = [ln.strip() for ln in open(allow_path)
               if ln.strip() and not ln.startswith("#")]
        passing = sorted(set(passing) | {o for o in old
                                         if results.get(o, ["pass"])[0]
                                         == "pass"})
    with open(allow_path, "w") as f:
        f.write("# sqllogictest files that pass fully against ddb_tpu\n"
                "# (generated by scripts/triage_sqllogic.py)\n")
        for rel in passing:
            f.write(rel + "\n")
    print(f"{len(passing)} passing files -> {allow_path}")

    # failure cause histogram
    from collections import Counter
    causes = Counter()
    for rel, v in results.items():
        if v[0] in ("fail", "error"):
            msg = v[1] if len(v) > 1 else ""
            causes[msg.split(":")[0][:60]] += 1
        elif v[0] in ("timeout", "crash"):
            causes[v[0]] += 1
    for cause, n in causes.most_common(25):
        print(f"{n:5d}  {cause}")


if __name__ == "__main__":
    main()
