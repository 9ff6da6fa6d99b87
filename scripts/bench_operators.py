#!/usr/bin/env python
"""Per-operator TPU benchmarks: filter, sort, join, aggregate rows/s/chip
vs speed-of-light rooflines (BASELINE.json metric).

Methodology: device-side repeat loops (amortize the ~24 ms tunnel round
trip), inputs varied per iteration to prevent loop hoisting, single scalar
fetch.  Results append to docs/OPERATOR_BENCH.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench_carried(loop_fn, reps, *args):
    """Like bench_loop but the caller provides the whole fori_loop with
    a loop-carried dependency baked in."""
    import jax
    import jax.numpy as jnp
    import functools

    jl = jax.jit(functools.partial(loop_fn, reps))
    base = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.int64) + 1)
    _ = np.asarray(jl(*args))
    _ = np.asarray(base(args[0]))
    t0 = time.perf_counter()
    _ = np.asarray(base(args[0]))
    rt = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(jl(*args))
        times.append(time.perf_counter() - t0)
    return max((min(times) - rt) / reps, 1e-9)


def bench_loop(make_step, reps, *args):
    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    def loop(*a):
        def body(i, acc):
            return acc + make_step(i, *a)
        return lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int64))

    jl = jax.jit(loop)
    base = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.int64) + 1)
    _ = np.asarray(jl(*args))
    _ = np.asarray(base(args[0]))
    t0 = time.perf_counter()
    _ = np.asarray(base(args[0]))
    rt = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(jl(*args))
        times.append(time.perf_counter() - t0)
    return max((min(times) - rt) / reps, 1e-9)


HBM_BW = 819e9   # v5e


def main(only=None):
    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    import ddb_tpu  # noqa: F401
    from ddb_tpu.ops import join as join_ops

    n = 6 * 1024 * 1024
    rng = np.random.default_rng(0)
    out_path = os.path.join(os.path.dirname(__file__), "..", "docs",
                            "OPERATOR_BENCH.json")
    results = {}
    if os.path.exists(out_path):
        try:
            results = json.load(open(out_path)).get("results", {})
        except Exception:
            results = {}

    def want(op):
        return only is None or op == only

    # ---- filter: predicate + count over 3 int32 columns -----------------
    if want("filter"):
        _bench_filter(results, n, rng, jax, lax, jnp)
    if want("sort"):
        _bench_sort(results, n, rng, jax, lax, jnp)
    if want("join"):
        _bench_join_single(results, n, rng, jax, lax, jnp, join_ops)
    if want("exchange"):
        _bench_exchange(results, n, rng, jax, lax, jnp)
    if want("aggregate"):
        _bench_aggregate(results, n, rng, jax, lax, jnp)

    for name, r in results.items():
        r["rows_per_sec"] = round(r["rows_per_sec"], 1)
        r["roofline"] = round(r["roofline"], 1)
        r["roofline_frac"] = round(r["rows_per_sec"] / r["roofline"], 4)
        print(f"{name:12s} {r['rows_per_sec']/1e9:8.2f} G rows/s   "
              f"{100*r['roofline_frac']:5.1f}% of roofline "
              f"({r['config']})")

    with open(out_path, "w") as f:
        json.dump({"chip": "v5e (axon tunnel)", "rows": n,
                   "results": results}, f, indent=1)
    print(f"saved {out_path}")


def _bench_filter(results, n, rng, jax, lax, jnp):
    a = jnp.asarray(rng.integers(0, 100, n).astype(np.int32))
    b = jnp.asarray(rng.integers(0, 1000, n).astype(np.int32))
    c = jnp.asarray(rng.integers(0, 10, n).astype(np.int32))

    def loop_filter(reps, a, b, c):
        # acc-dependent threshold: loop-carried dependency prevents XLA
        # from collapsing iterations via CSE
        def body(i, acc):
            m = (a > (24 + (acc & 1)).astype(jnp.int32)) & (b < 900) \
                & (c != 3)
            return acc + m.astype(jnp.int64).sum()
        import jax.lax as _lax
        return _lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int64))

    print("bench: filter...", file=sys.stderr, flush=True)
    t = bench_carried(loop_filter, 20, a, b, c)
    results["filter"] = {
        "rows_per_sec": n / t,
        "roofline": HBM_BW / 12,          # 3 int32 reads
        "config": "3-column conjunctive predicate, 6.3M rows",
    }


def _bench_sort(results, n, rng, jax, lax, jnp):
    # ---- sort: 1-key int64 + carried row id ------------------------------
    k = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
    rid = jnp.asarray(np.arange(n, dtype=np.int32))

    def sort_step(i, k, rid):
        out = lax.sort([k + i, rid], num_keys=1)
        return out[1][0].astype(jnp.int64)

    print("bench: sort...", file=sys.stderr, flush=True)
    t = bench_loop(sort_step, 12, k, rid)
    # sort roofline: log2(n) passes over (8+4)B/row (merge-network model)
    passes = int(np.ceil(np.log2(n)))
    results["sort"] = {
        "rows_per_sec": n / t,
        "roofline": HBM_BW / (12 * passes),
        "config": "int64 key + int32 payload, 6.3M rows",
    }


def _bench_join(results, n, rng, jax, lax, jnp, join_ops):
    # ---- join: build 1M, probe 6.3M, expand ------------------------------
    nb = 1 << 20
    bk = jnp.asarray(rng.permutation(nb).astype(np.int64))
    bsel = jnp.asarray(np.ones(nb, dtype=bool))
    pk = jnp.asarray(rng.integers(0, nb, n).astype(np.int64))
    psel = jnp.asarray(np.ones(n, dtype=bool))


    # build() takes (key, key_null, sel)
    def join_step(i, bk, bsel, pk, psel):  # noqa: F811
        bt = join_ops.build(bk + (i % 2), None, bsel)
        lo, cnt = join_ops.probe_ranges(bt, pk + (i % 2), None, psel)
        return cnt.astype(jnp.int64).sum()

    print("bench: join...", file=sys.stderr, flush=True)
    t = bench_loop(join_step, 5, bk, bsel, pk, psel)
    results["join_probe"] = {
        "rows_per_sec": n / t,
        "roofline": HBM_BW / (12 * int(np.ceil(np.log2(n + nb)))),
        "config": "1M build x 6.3M probe, unique keys (merge probe)",
    }


def _bench_aggregate(results, n, rng, jax, lax, jnp):
    # ---- aggregate: pallas fused Q1 --------------------------------------
    from ddb_tpu.ops import pallas_agg as P
    qty = jnp.asarray(rng.integers(100, 5100, n).astype(np.int32))
    ext = jnp.asarray(rng.integers(90000, 520000000, n).astype(np.int32))
    dc = jnp.asarray(rng.integers(0, 11, n).astype(np.int32))
    tx = jnp.asarray(rng.integers(0, 9, n).astype(np.int32))
    sd = jnp.asarray(rng.integers(8000, 10600, n).astype(np.int32))
    gid = jnp.asarray(rng.integers(0, 6, n).astype(np.int32))

    def agg_step(i, *args):
        return P.q1_fused_aggregate(*args, 10471 - (i % 2), n_rows=n).sum()

    print("bench: aggregate...", file=sys.stderr, flush=True)
    t = bench_loop(agg_step, 200, qty, ext, dc, tx, sd, gid)
    results["aggregate"] = {
        "rows_per_sec": n / t,
        "roofline": HBM_BW / 24,          # 6 int32 columns
        "config": "Q1 fused filter + 6-group x 8-payload aggregate",
    }


def bench_single(jfn, args, reps=5):
    """Single-call timing with round-trip subtraction — for graphs whose
    fori_loop variant overwhelms the remote compiler (join/exchange)."""
    import jax
    import jax.numpy as jnp
    import numpy as _np

    base = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.int64) + 1)
    _ = _np.asarray(jfn(*args))
    _ = _np.asarray(base(args[0]))
    rts = []
    for _i in range(5):
        t0 = time.perf_counter()
        _ = _np.asarray(base(args[0]))
        rts.append(time.perf_counter() - t0)
    rts.sort()
    rt = rts[len(rts) // 2]
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        _ = _np.asarray(jfn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return max(ts[len(ts) // 2] - rt, 1e-9)


def _bench_join_single(results, n, rng, jax, lax, jnp, join_ops):
    """join probe via ONE jitted call (no fori_loop): the loop variant's
    graph takes >90 min on the remote compiler."""
    nb = 1 << 20
    bk = jnp.asarray(rng.permutation(nb).astype(np.int64))
    bsel = jnp.asarray(np.ones(nb, dtype=bool))
    pk = jnp.asarray(rng.integers(0, nb, n).astype(np.int64))
    psel = jnp.asarray(np.ones(n, dtype=bool))

    @jax.jit
    def join_once(bk, bsel, pk, psel):
        bt = join_ops.build(bk, None, bsel)
        lo, cnt = join_ops.probe_ranges(bt, pk, None, psel)
        return cnt.astype(jnp.int64).sum()

    print("bench: join (single-call)...", file=sys.stderr, flush=True)
    t = bench_single(join_once, (bk, bsel, pk, psel))
    results["join_probe"] = {
        "rows_per_sec": n / t,
        "roofline": HBM_BW / (12 * int(np.ceil(np.log2(n + nb)))),
        "config": "1M build x 6.3M probe, unique keys (merge probe, "
                  "single-call timing)",
    }


def _bench_exchange(results, n, rng, jax, lax, jnp):
    """single-chip exchange-pack kernel: pid sort + slice into the
    [n_shards, cap] send buffer (the all_to_all itself needs >1 chip)."""
    n_shards = 8
    cap = (n // n_shards) * 2
    keys = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
    pay = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int64))
    sel = jnp.asarray(np.ones(n, dtype=bool))

    @jax.jit
    def pack_once(keys, pay, sel):
        from ddb_tpu.ops import hashing
        pid = hashing.partition_of(hashing.hash64(keys), n_shards)
        p = jnp.where(sel, pid, n_shards)
        sp, sk, spay = lax.sort([p, keys, pay], num_keys=1,
                                is_stable=True)
        counts = jnp.stack([(sp == q).astype(jnp.int32).sum()
                            for q in range(n_shards)])
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                  jnp.cumsum(counts)[:-1]])
        # production pack (parallel/exchange.py): per-shard contiguous
        # dynamic slices over a sentinel-padded array
        padded = jnp.concatenate([sk, jnp.zeros(cap, dtype=sk.dtype)])
        send = jnp.stack([
            lax.dynamic_slice(padded, (starts[p],), (cap,))
            for p in range(n_shards)])
        return send.astype(jnp.int64).sum()

    print("bench: exchange-pack...", file=sys.stderr, flush=True)
    t = bench_single(pack_once, (keys, pay, sel))
    results["exchange_pack"] = {
        "rows_per_sec": n / t,
        "roofline": HBM_BW / (16 * (int(np.ceil(np.log2(n))) + 2)),
        "config": "8-way pid sort-pack, int64 key+payload, 6.3M rows",
    }


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default=None,
                    choices=["filter", "sort", "join", "aggregate", "exchange"])
    ap.add_argument("--all-in-subprocesses", action="store_true",
                    help="run each op in a fresh process (the axon "
                         "tunnel session can wedge after several large "
                         "compiles in one process)")
    args = ap.parse_args()
    if args.all_in_subprocesses:
        import subprocess
        for op in ("filter", "sort", "join", "aggregate", "exchange"):
            print(f"=== {op} (subprocess)", file=sys.stderr, flush=True)
            r = subprocess.run([sys.executable, __file__, "--op", op],
                               timeout=3600)
            print(f"=== {op} rc={r.returncode}", file=sys.stderr,
                  flush=True)
    else:
        main(args.op)
