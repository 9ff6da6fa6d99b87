"""ClickBench suite subset (reference: benchmark/clickbench/).

The official hits.parquet needs network access (zero-egress here), so a
distribution-shaped synthetic `hits` table covers the columns used by the
supported queries; correctness is differential vs the reference CLI on
identical data (like the h2oai suite)."""

from __future__ import annotations

import numpy as np

# queries (verbatim from reference benchmark/clickbench/queries/) that the
# engine supports today; keys are the official numbers
QUERIES = {
    0: "SELECT COUNT(*) FROM hits",
    1: "SELECT COUNT(*) FROM hits WHERE AdvEngineID <> 0",
    2: "SELECT SUM(AdvEngineID), COUNT(*), AVG(ResolutionWidth) FROM hits",
    3: "SELECT AVG(UserID) FROM hits",
    4: "SELECT COUNT(DISTINCT UserID) FROM hits",
    5: "SELECT COUNT(DISTINCT SearchPhrase) FROM hits",
    6: "SELECT MIN(EventDate), MAX(EventDate) FROM hits",
    7: "SELECT AdvEngineID, COUNT(*) FROM hits WHERE AdvEngineID <> 0 "
       "GROUP BY AdvEngineID ORDER BY COUNT(*) DESC",
    8: "SELECT RegionID, COUNT(DISTINCT UserID) AS u FROM hits "
       "GROUP BY RegionID ORDER BY u DESC LIMIT 10",
    9: "SELECT RegionID, SUM(AdvEngineID), COUNT(*) AS c, "
       "AVG(ResolutionWidth), COUNT(DISTINCT UserID) FROM hits "
       "GROUP BY RegionID ORDER BY c DESC LIMIT 10",
    10: "SELECT MobilePhoneModel, COUNT(DISTINCT UserID) AS u FROM hits "
        "WHERE MobilePhoneModel <> '' GROUP BY MobilePhoneModel "
        "ORDER BY u DESC LIMIT 10",
    12: "SELECT SearchPhrase, COUNT(*) AS c FROM hits "
        "WHERE SearchPhrase <> '' GROUP BY SearchPhrase "
        "ORDER BY c DESC LIMIT 10",
    13: "SELECT SearchEngineID, SearchPhrase, COUNT(*) AS c FROM hits "
        "WHERE SearchPhrase <> '' GROUP BY SearchEngineID, SearchPhrase "
        "ORDER BY c DESC LIMIT 10",
    14: "SELECT SearchPhrase, COUNT(DISTINCT UserID) AS u FROM hits "
        "WHERE SearchPhrase <> '' GROUP BY SearchPhrase "
        "ORDER BY u DESC LIMIT 10",
    15: "SELECT UserID, COUNT(*) FROM hits GROUP BY UserID "
        "ORDER BY COUNT(*) DESC LIMIT 10",
    21: "SELECT SearchPhrase, MIN(URL), COUNT(*) AS c FROM hits "
        "WHERE URL LIKE '%google%' AND SearchPhrase <> '' "
        "GROUP BY SearchPhrase ORDER BY c DESC LIMIT 10",
    38: "SELECT URL, COUNT(*) AS c FROM hits GROUP BY URL "
        "ORDER BY c DESC LIMIT 10",
}


def generate(n: int, seed: int = 11):
    """Synthetic hits columns covering the supported queries."""
    rng = np.random.default_rng(seed)
    phrases = np.array(
        [""] * 5 + [f"search phrase {i}" for i in range(200)])
    models = np.array([""] * 3 + [f"Phone-{i}" for i in range(20)])
    urls = np.array([f"http://example{i}.com/page" for i in range(300)]
                    + [f"http://google.com/q{i}" for i in range(30)])
    return {
        "AdvEngineID": np.where(rng.random(n) < 0.8, 0,
                                rng.integers(1, 20, n)).astype(np.int32),
        "ResolutionWidth": rng.integers(800, 2560, n).astype(np.int32),
        "UserID": rng.integers(0, n // 3 + 1, n).astype(np.int64),
        "RegionID": rng.integers(0, 100, n).astype(np.int32),
        "SearchEngineID": rng.integers(0, 10, n).astype(np.int32),
        "SearchPhrase": rng.choice(phrases, n),
        "MobilePhoneModel": rng.choice(models, n),
        "URL": rng.choice(urls, n),
        "EventDate": rng.integers(15000, 15100, n).astype(np.int32),
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
                else:
                    row.append(v)
            w.writerow(row)
    return path
