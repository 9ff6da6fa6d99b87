#!/usr/bin/env python
"""Experiment 2b: time the b512+bitonic-merge-cascade sort with single
jitted calls (no fori_loop — the 13-level cascade graph already pushes
the remote compiler; keep ONE copy of it).  Round trip is measured
separately and subtracted."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ddb_tpu.ops import tpu_sort

    n = 6 * 1024 * 1024
    rng = np.random.default_rng(0)
    k64 = (rng.integers(0, 1 << 40, n).astype(np.int64) << 23) \
        | np.arange(n, dtype=np.int64)
    ka = jnp.asarray(k64)

    @jax.jit
    def f(x):
        (out,) = tpu_sort.sort_ops([x], num_keys=1)
        return out[0] + out[-1]

    @jax.jit
    def f2(x):
        out = tpu_sort.sort_ops([x, (x >> 23).astype(jnp.int32)],
                                num_keys=1)
        return out[0][0] + out[1][-1].astype(jnp.int64)

    @jax.jit
    def rt(x):
        return x[0] + 1

    print("compiling...", flush=True)
    t0 = time.perf_counter()
    _ = np.asarray(f(ka))
    print(f"compile f: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    _ = np.asarray(f2(ka))
    print(f"compile f2: {time.perf_counter()-t0:.1f}s", flush=True)
    _ = np.asarray(rt(ka))

    def best(fn, k=9):
        ts = []
        for _ in range(k):
            t0 = time.perf_counter()
            _ = np.asarray(fn(ka))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[0], ts[len(ts) // 2]

    rt_min, rt_med = best(rt)
    f_min, f_med = best(f)
    f2_min, f2_med = best(f2)
    out = {
        "roundtrip_ms": round(rt_med * 1e3, 2),
        "key_only_ms": round((f_med - rt_med) * 1e3, 2),
        "key_only_rows_per_s": round(n / max(f_med - rt_med, 1e-9), 1),
        "key_payload_ms": round((f2_med - rt_med) * 1e3, 2),
        "key_payload_rows_per_s": round(n / max(f2_med - rt_med, 1e-9),
                                        1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
