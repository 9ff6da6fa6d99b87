"""Benchmark entry point (driver-run on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: TPC-H Q1 aggregate throughput (rows/s) on the flagship fused
filter + dense-group aggregate path, single chip.

Methodology: the axon tunnel adds ~24 ms per host round trip, so the
kernel repeats K times inside one jit (cutoff varies per iteration to
prevent loop hoisting) and the per-iteration time is (loop - baseline)/K.
vs_baseline = fraction of the HBM-bandwidth roofline (Q1 touches
5x int64 + 3x int32 columns ~= 52 B/row; v5e HBM ~819 GB/s =>
~15.7e9 rows/s speed of light).
"""

import json
import os
import time

import numpy as np


def _bench_pallas(n, reps):
    """Flagship: Pallas single-pass fused filter+aggregate
    (ddb_tpu/ops/pallas_agg.py).  Returns the result dict or raises."""
    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    import ddb_tpu  # noqa: F401
    from ddb_tpu.bench.tpch import synth_lineitem
    from ddb_tpu.ops import pallas_agg as P

    n = (n // 1024) * 1024
    d = synth_lineitem(n, seed=0)
    args = (jnp.asarray(d["l_quantity"].astype(np.int32)),
            jnp.asarray(d["l_extendedprice"].astype(np.int32)),
            jnp.asarray(d["l_discount"].astype(np.int32)),
            jnp.asarray(d["l_tax"].astype(np.int32)),
            jnp.asarray(d["l_shipdate"]),
            jnp.asarray((d["l_returnflag"] * 2
                         + d["l_linestatus"]).astype(np.int32)))

    def loop(*a):
        def body(i, acc):
            return acc + P.q1_fused_aggregate(
                *a, 10471 - (i % 2), n_rows=n)
        return lax.fori_loop(0, reps, body,
                             jnp.zeros((P.GROUPS, P.PAYLOADS), jnp.int64))

    jl = jax.jit(loop)
    base = jax.jit(lambda x: x[0] + 1)
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
    per = max((min(times) - rt) / reps, 1e-9)
    rows_per_sec = n / per
    roofline = 819e9 / (6 * 4)      # 6 int32 columns
    return {
        "metric": "tpch_q1_sf1_agg_rows_per_sec",
        "value": round(rows_per_sec, 1),
        "unit": "rows/s",
        "vs_baseline": round(rows_per_sec / roofline, 4),
    }


def main():
    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    import ddb_tpu  # noqa: F401
    from ddb_tpu.bench.tpch import synth_lineitem

    n = int(os.environ.get("BENCH_ROWS", 6_001_215))
    reps = int(os.environ.get("BENCH_REPS", 10))

    try:
        res = _bench_pallas(n, reps)
    except Exception:
        res = None
    if res is not None:
        print(json.dumps(res))
        return

    d = synth_lineitem(n, seed=0)

    args = (jnp.asarray(d["l_quantity"]), jnp.asarray(d["l_extendedprice"]),
            jnp.asarray(d["l_discount"]), jnp.asarray(d["l_tax"]),
            jnp.asarray(d["l_shipdate"]), jnp.asarray(d["l_returnflag"]),
            jnp.asarray(d["l_linestatus"]))

    def q1_once(cutoff, quantity, extended, discount, tax, shipdate, rf,
                ls):
        sel = shipdate <= cutoff
        disc_price = extended * (100 - discount)
        charge = disc_price * (100 + tax)
        gid = rf * 2 + ls
        payloads = (quantity, extended, disc_price, charge, discount)
        acc = jnp.zeros((), jnp.int64)
        for g in range(6):
            m = sel & (gid == g)
            acc = acc + m.astype(jnp.int64).sum()
            for p in payloads:
                acc = acc + jnp.where(m, p, 0).sum()
        return acc

    def repeat_kernel(*args):
        def body(i, acc):
            # vary the cutoff so the loop body is not hoisted
            return acc + q1_once(jnp.int32(10471) - (i % 2), *args)
        return lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int64))

    jloop = jax.jit(repeat_kernel)
    baseline_fn = jax.jit(lambda x: x[0] + 1)

    _ = np.asarray(jloop(*args))            # compile + warm
    _ = np.asarray(baseline_fn(args[0]))

    t0 = time.perf_counter()
    _ = np.asarray(baseline_fn(args[0]))
    rt = time.perf_counter() - t0           # tunnel round trip

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(jloop(*args))
        times.append(time.perf_counter() - t0)
    per_iter = max((min(times) - rt) / reps, 1e-9)
    rows_per_sec = n / per_iter

    bytes_per_row = 5 * 8 + 3 * 4
    roofline = 819e9 / bytes_per_row
    print(json.dumps({
        "metric": "tpch_q1_sf1_agg_rows_per_sec",
        "value": round(rows_per_sec, 1),
        "unit": "rows/s",
        "vs_baseline": round(rows_per_sec / roofline, 4),
    }))


if __name__ == "__main__":
    main()
