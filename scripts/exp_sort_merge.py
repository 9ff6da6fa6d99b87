#!/usr/bin/env python
"""Experiment 2: merge-phase candidates for the TPU sample sort.

  handfull : hand-written XOR-pattern bitonic FULL sort, flat int64
             (tests whether XLA fuses compare-exchange stages better
             than its own lax.sort expansion)
  b512+mrg : batched lax.sort runs of 512, then hand-written bitonic
             merge cascade (reshape+flip+minmax, all within-row ops)
Packed single-int64 keys (63-bit key+rid), 6.3M elements.
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
    k64 = (rng.integers(0, 1 << 40, n).astype(np.int64) << 23) \
        | np.arange(n, dtype=np.int64)

    def timeit(f):
        t0 = time.perf_counter(); f(); return time.perf_counter() - t0

    def slope(jfn, args, lo=3, hi=9):
        jlo = jax.jit(lambda *a: jfn(lo, *a))
        jhi = jax.jit(lambda *a: jfn(hi, *a))
        _ = np.asarray(jlo(*args)); _ = np.asarray(jhi(*args))
        tl = min(timeit(lambda: np.asarray(jlo(*args))) for _ in range(3))
        th = min(timeit(lambda: np.asarray(jhi(*args))) for _ in range(3))
        return max((th - tl) / (hi - lo), 1e-9)

    results = {}

    def report(name, t):
        results[name] = n / t
        print(f"{name:12s} {t*1e3:8.2f} ms   {n/t/1e6:9.1f} M rows/s",
              flush=True)

    ka = jnp.asarray(k64)

    # ---- correctness helper (one shot, small) ---------------------------
    def check(fn, m=1 << 15):
        x = jnp.asarray(k64[:m])
        out = np.asarray(jax.jit(fn)(x))
        assert (out == np.sort(k64[:m])).all(), "sort mismatch!"

    # ---- hand bitonic merge: rows of (T, S) each a bitonic seq ----------
    def merge_rows(v, S):
        """v: (T, S) where each row = [sorted asc | sorted desc] (a
        bitonic sequence); returns (T, S) rows sorted asc.  All ops are
        reshapes + elementwise min/max — no gather."""
        T = v.shape[0]
        j = S // 2
        while j >= 1:
            w = v.reshape(T, S // (2 * j), 2, j)
            a, b = w[:, :, 0, :], w[:, :, 1, :]
            v = jnp.stack([jnp.minimum(a, b), jnp.maximum(a, b)],
                          axis=2).reshape(T, S)
            j //= 2
        return v

    def cascade(v, S0, n_out):
        """(T, S0) sorted rows -> fully sorted flat, by pairwise bitonic
        merges: concat(row0, reverse(row1)) is bitonic.  Odd row counts
        pad with a +INF sentinel row (trimmed by the final slice)."""
        T, S = v.shape[0], S0
        while T > 1:
            if T % 2:
                v = jnp.concatenate(
                    [v, jnp.full((1, S), jnp.iinfo(v.dtype).max,
                                 v.dtype)], axis=0)
                T += 1
            ev, od = v[0::2], v[1::2]
            v = jnp.concatenate([ev, od[:, ::-1]], axis=1)
            S *= 2
            T //= 2
            v = merge_rows(v, S)
        return v.reshape(-1)[:n_out]

    S0 = 512

    def full_b512_merge(x):
        T = x.shape[0] // S0
        (r,) = lax.sort([x.reshape(T, S0)], dimension=1, num_keys=1)
        return cascade(r, S0, x.shape[0])

    check(full_b512_merge)
    print("b512+merge correct", flush=True)

    def loop_merge(reps, x):
        def body(i, acc):
            out = full_b512_merge(x + i)
            return acc + out[0].astype(jnp.int64)
        return lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int64))
    report("b512+merge", slope(loop_merge, (ka,), lo=2, hi=6))

    # ---- hand full bitonic (XOR network) flat ---------------------------
    def hand_full(x):
        n_in = x.shape[0]
        n_ = 1 << int(np.ceil(np.log2(n_in)))
        if n_ != n_in:
            x = jnp.concatenate(
                [x, jnp.full((n_ - n_in,), jnp.iinfo(x.dtype).max,
                             x.dtype)])
        v = x.reshape(1, n_)
        k = 2
        while k <= n_:
            # blocks of k/2 are sorted asc; [A | reverse(B)] is bitonic
            w = v.reshape(n_ // k, k)
            w = jnp.concatenate([w[:, : k // 2], w[:, k // 2:][:, ::-1]],
                                axis=1)
            v = merge_rows(w, k).reshape(1, n_)
            k *= 2
        return v.reshape(-1)[:n_in]

    check(hand_full)
    print("hand_full correct", flush=True)

    def loop_hand(reps, x):
        def body(i, acc):
            out = hand_full(x + i)
            return acc + out[0].astype(jnp.int64)
        return lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int64))
    report("hand_full", slope(loop_hand, (ka,), lo=1, hi=3))

    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
