"""ClickBench suite (reference: benchmark/clickbench/).

The official hits.parquet needs network access (zero-egress here), so a
distribution-shaped synthetic `hits` table covers every column the 43
official queries touch; correctness is differential vs the reference CLI
on identical data (like the h2oai suite).  Query texts are read verbatim
from the reference's benchmark/clickbench/queries/ directory.
"""

from __future__ import annotations

import os

import numpy as np

_QUERY_DIR = "/root/reference/benchmark/clickbench/queries"


def _load_queries():
    out = {}
    if not os.path.isdir(_QUERY_DIR):
        return out
    for fn in sorted(os.listdir(_QUERY_DIR)):
        if fn.startswith("q") and fn.endswith(".sql"):
            n = int(fn[1:3])
            out[n] = open(os.path.join(_QUERY_DIR, fn)).read().strip() \
                .rstrip(";")
    return out


QUERIES = _load_queries()


def generate(n: int, seed: int = 11):
    """Synthetic hits columns covering all 43 queries.  Distributions are
    shaped so the selective filters (CounterID=62, July-2013 dates,
    URLHash/RefererHash constants) hit non-trivial row subsets."""
    rng = np.random.default_rng(seed)
    phrases = np.array(
        [""] * 5 + [f"search phrase {i}" for i in range(200)])
    models = np.array([""] * 3 + [f"Phone-{i}" for i in range(20)])
    urls = np.array([""] * 2
                    + [f"http://example{i}.com/page" for i in range(300)]
                    + [f"http://google.com/q{i}" for i in range(30)]
                    + [f"http://sub.google.com/r{i}" for i in range(10)])
    titles = np.array([""] * 3
                      + [f"Title {i}" for i in range(150)]
                      + [f"Google result {i}" for i in range(20)])
    referers = np.array([""] * 4
                        + [f"https://www.ref{i}.org/p/{i}" for i in
                           range(120)]
                        + [f"http://site{i}.net/x" for i in range(40)])
    # EventDate: days around 2013-07 (epoch days; 2013-07-01 = 15887)
    event_date = rng.integers(15860, 15950, n).astype(np.int32)
    # EventTime: seconds within 2013-07-14..15 plus spread
    base = 1373760000   # 2013-07-14 00:00:00 UTC
    event_time = (base + rng.integers(-40 * 86400, 3 * 86400, n)
                  ).astype(np.int64)
    urlhash = rng.integers(0, 1 << 40, n).astype(np.int64)
    urlhash[rng.random(n) < 0.02] = 2868770270353813622
    refhash = rng.integers(0, 1 << 40, n).astype(np.int64)
    refhash[rng.random(n) < 0.02] = 3594120000172545465
    return {
        "WatchID": rng.integers(0, n, n).astype(np.int64),
        "CounterID": np.where(rng.random(n) < 0.15, 62,
                              rng.integers(1, 200, n)).astype(np.int32),
        "ClientIP": rng.integers(0, 1 << 31, n).astype(np.int64),
        "AdvEngineID": np.where(rng.random(n) < 0.8, 0,
                                rng.integers(1, 20, n)).astype(np.int32),
        "ResolutionWidth": rng.integers(800, 2560, n).astype(np.int32),
        "WindowClientWidth": rng.integers(300, 2000, n).astype(np.int32),
        "WindowClientHeight": rng.integers(200, 1200, n).astype(np.int32),
        "UserID": rng.integers(0, n // 3 + 1, n).astype(np.int64),
        "RegionID": rng.integers(0, 100, n).astype(np.int32),
        "SearchEngineID": rng.integers(0, 10, n).astype(np.int32),
        "TraficSourceID": rng.integers(-1, 10, n).astype(np.int32),
        "IsRefresh": (rng.random(n) < 0.1).astype(np.int32),
        "IsLink": (rng.random(n) < 0.3).astype(np.int32),
        "IsDownload": (rng.random(n) < 0.05).astype(np.int32),
        "DontCountHits": (rng.random(n) < 0.1).astype(np.int32),
        "SearchPhrase": rng.choice(phrases, n),
        "MobilePhone": rng.integers(0, 6, n).astype(np.int32),
        "MobilePhoneModel": rng.choice(models, n),
        "URL": rng.choice(urls, n),
        "Title": rng.choice(titles, n),
        "Referer": rng.choice(referers, n),
        "URLHash": urlhash,
        "RefererHash": refhash,
        "EventDate": event_date,
        "EventTime": event_time,
    }


def register(con, cols):
    import datetime
    import pyarrow as pa
    arrs = {}
    for k, v in cols.items():
        if k == "EventDate":
            arrs[k] = pa.array(
                [datetime.date(1970, 1, 1)
                 + datetime.timedelta(days=int(x)) for x in v])
        elif k == "EventTime":
            arrs[k] = pa.array(
                [datetime.datetime(1970, 1, 1)
                 + datetime.timedelta(seconds=int(x)) for x in v])
        elif v.dtype == object or v.dtype.kind == "U":
            arrs[k] = pa.array([str(x) for x in v])
        else:
            arrs[k] = pa.array(v)
    con.register("hits", pa.table(arrs))
    return con


def write_csv(cols, path: str):
    import datetime
    import csv
    keys = list(cols)
    n = len(cols[keys[0]])
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(keys)
        for i in range(n):
            row = []
            for k in keys:
                v = cols[k][i]
                if k == "EventDate":
                    row.append((datetime.date(1970, 1, 1)
                                + datetime.timedelta(days=int(v)))
                               .isoformat())
                elif k == "EventTime":
                    row.append((datetime.datetime(1970, 1, 1)
                                + datetime.timedelta(seconds=int(v)))
                               .isoformat(sep=" "))
                else:
                    row.append(v)
            w.writerow(row)
    return path
