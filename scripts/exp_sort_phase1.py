#!/usr/bin/env python
"""Experiment: is XLA's *batched* lax.sort (many small rows, minor dim)
fast enough to serve as the local-sort phase of a sample sort?

Measures rows/s for sorting 6.3M (key,int32 payload) elements:
  flat      : one lax.sort over the whole array (current production path)
  bNNN      : reshape to (T, NNN) and lax.sort along axis=-1 (batched)
  flat_i32  : limb-pair int32 keys instead of int64
Slope methodology (two rep counts) per docs/PERF_NOTES.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.lax as lax
    import jax.numpy as jnp

    n = 6 * 1024 * 1024
    rng = np.random.default_rng(0)
    k64 = rng.integers(0, 1 << 40, n).astype(np.int64)
    rid = np.arange(n, dtype=np.int32)

    def slope(jfn, args, lo=3, hi=9):
        jlo = jax.jit(lambda *a: jfn(lo, *a))
        jhi = jax.jit(lambda *a: jfn(hi, *a))
        _ = np.asarray(jlo(*args)); _ = np.asarray(jhi(*args))
        tl = min(timeit(lambda: np.asarray(jlo(*args))) for _ in range(3))
        th = min(timeit(lambda: np.asarray(jhi(*args))) for _ in range(3))
        return max((th - tl) / (hi - lo), 1e-9)

    def timeit(f):
        t0 = time.perf_counter(); f(); return time.perf_counter() - t0

    results = {}

    def report(name, t):
        results[name] = n / t
        print(f"{name:12s} {t*1e3:8.2f} ms   {n/t/1e6:9.1f} M rows/s",
              flush=True)

    # flat baseline
    ka = jnp.asarray(k64); ra = jnp.asarray(rid)

    def flat(reps, k, r):
        def body(i, acc):
            out = lax.sort([k + i, r], num_keys=1)
            return acc + out[1][0].astype(jnp.int64)
        return lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int64))
    report("flat", slope(flat, (ka, ra)))

    # batched variants
    for S in (512, 2048, 16384, 65536):
        T = n // S
        kb = jnp.asarray(k64.reshape(T, S))
        rb = jnp.asarray(rid.reshape(T, S))

        def batched(reps, k, r):
            def body(i, acc):
                out = lax.sort([k + i, r], dimension=1, num_keys=1)
                return acc + out[1][0, 0].astype(jnp.int64)
            return lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int64))
        report(f"b{S}", slope(batched, (kb, rb)))

    # int32 limb pair, flat
    khi = jnp.asarray((k64 >> 32).astype(np.int32))
    klo = jnp.asarray((k64 & 0xFFFFFFFF).astype(np.uint32).astype(np.int32))

    def flat32(reps, hi_, lo_, r):
        def body(i, acc):
            out = lax.sort([hi_ + i, lo_, r], num_keys=2)
            return acc + out[2][0].astype(jnp.int64)
        return lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int64))
    report("flat_i32", slope(flat32, (khi, klo, ra)))

    # int32 limb pair, batched 2048
    S = 2048; T = n // S
    khb = jnp.asarray((k64 >> 32).astype(np.int32).reshape(T, S))
    klb = jnp.asarray((k64 & 0xFFFFFFFF).astype(np.uint32)
                      .astype(np.int32).reshape(T, S))
    rb = jnp.asarray(rid.reshape(T, S))

    def b32(reps, hi_, lo_, r):
        def body(i, acc):
            out = lax.sort([hi_ + i, lo_, r], dimension=1, num_keys=2)
            return acc + out[2][0, 0].astype(jnp.int64)
        return lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int64))
    report("b2048_i32", slope(b32, (khb, klb, rb)))

    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
