#!/usr/bin/env python
"""Sort-algorithm study on real TPU: measures every candidate sort
strategy plus the VPU op-rate that bounds comparison networks.

Findings feed docs/PERF_NOTES.md and the sort roofline recalibration in
bench_operators.py (see round-4 notes).  Run one case per process if the
tunnel wedges: `python scripts/bench_sort_study.py --case packed`.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench_carried(loop_fn, reps, *args):
    import functools

    import jax
    import jax.numpy as jnp

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default=None)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    import ddb_tpu  # noqa: F401

    n = 6 * 1024 * 1024
    rng = np.random.default_rng(0)
    k64 = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
    rid = jnp.asarray(np.arange(n, dtype=np.int32))
    k32 = jnp.asarray(rng.integers(0, 1 << 20, n).astype(np.int32))
    out = {}

    def run(name, loop_fn, *a, reps=args.reps):
        if args.case is not None and args.case != name:
            return
        print(f"case {name}...", file=sys.stderr, flush=True)
        t = bench_carried(loop_fn, reps, *a)
        out[name] = {"ms": round(t * 1e3, 3),
                     "rows_per_sec": round(n / t, 1)}
        print(f"  {name}: {t*1e3:.2f} ms = {n/t/1e6:.0f}M rows/s",
              file=sys.stderr, flush=True)

    # 1. current bench config: 2-operand (int64 key, int32 rid)
    def s2(reps, k, r):
        def body(i, acc):
            o = lax.sort([k + i, r], num_keys=1)
            return acc + o[1][0].astype(jnp.int64)
        return lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int64))
    run("twoop", s2, k64, rid)

    # 2. packed single int64 operand (40-bit key + 23-bit rid)
    def sp(reps, k, r):
        def body(i, acc):
            packed = ((k + i) << 23) | r.astype(jnp.int64)
            (o,) = lax.sort([packed], num_keys=1)
            return acc + (o[0] & ((1 << 23) - 1))
        return lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int64))
    run("packed", sp, k64, rid)

    # 3. engine path: ops.order.sort_permutation adaptive cond
    from ddb_tpu.ops import order as O
    sel = jnp.ones(n, dtype=bool)

    def se(reps, k, s):
        def body(i, acc):
            p = O.sort_permutation([k + i], s)
            return acc + p[0].astype(jnp.int64)
        return lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int64))
    run("engine_adaptive", se, k64, sel)

    # 4. single int32 operand (narrow-key case)
    def s32(reps, k):
        def body(i, acc):
            (o,) = lax.sort([k + i], num_keys=1)
            return acc + o[0].astype(jnp.int64)
        return lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int64))
    run("int32_1op", s32, k32)

    # 5. batched tile sorts: (48, 131072) int64
    kb = k64.reshape(48, 131072)

    def sb(reps, k):
        def body(i, acc):
            o = lax.sort([k + i], num_keys=1, dimension=1)
            return acc + o[0][0, 0]
        return lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int64))
    run("batched_48x128k", sb, kb)

    # 6. VPU int32 op-rate: chain of CHAIN fused elementwise min/max ops
    CHAIN = 96

    def vpu(reps, k):
        def body(i, acc):
            x = k + i
            for c in range(CHAIN // 2):
                x = jnp.minimum(jnp.maximum(x, -c), 1 << (c % 24))
            return acc + x[0].astype(jnp.int64)
        return lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int64))
    if args.case in (None, "vpu_chain"):
        print("case vpu_chain...", file=sys.stderr, flush=True)
        t = bench_carried(vpu, args.reps, k32)
        rate = CHAIN * n / t
        out["vpu_chain"] = {"ms": round(t * 1e3, 3),
                            "ops_per_sec": round(rate, 1),
                            "chain": CHAIN}
        print(f"  vpu: {rate/1e12:.2f} T int32 ops/s",
              file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "SORT_STUDY.json")
    prev = {}
    if os.path.exists(path):
        try:
            prev = json.load(open(path)).get("results", {})
        except Exception:
            pass
    prev.update(out)
    with open(path, "w") as f:
        json.dump({"chip": "v5e (axon tunnel)", "rows": n,
                   "results": prev}, f, indent=1)
    print(json.dumps(prev, indent=1))


if __name__ == "__main__":
    main()
