"""Differential-testing helper: run SQL through the reference duckdb CLI
(built from /root/reference into /tmp/ddbbuild) and return rows as strings.

This is our answer-set generator for suites whose official data needs
network access (h2oai, ClickBench) and for random differential tests —
mirroring the reference's own benchmark RESULT_QUERY mechanism."""

import csv
import io
import os
import subprocess

ORACLE = os.environ.get("DDB_ORACLE", "/tmp/ddbbuild/duckdb")


def available() -> bool:
    return os.path.exists(ORACLE)


def query(sql: str, init: str = "") -> list:
    """Returns rows as lists of strings (duckdb CSV output, header dropped).
    NULL renders as empty string."""
    script = init + "\n.mode csv\n.headers off\n" + sql.rstrip().rstrip(
        ";") + ";\n"
    out = subprocess.run([ORACLE, "-batch"], input=script,
                         capture_output=True, text=True, timeout=600)
    if out.returncode != 0:
        raise RuntimeError(f"oracle failed: {out.stderr[:500]}")
    rows = list(csv.reader(io.StringIO(out.stdout)))
    return rows
