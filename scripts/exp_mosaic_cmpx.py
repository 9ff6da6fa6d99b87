#!/usr/bin/env python
"""Probe: Mosaic compare-exchange stage throughput.

A Pallas kernel runs STAGES whole-vreg compare-exchange stages over a
VMEM-resident (R, 128) int32 limb-pair tile (the inner loop of any
bitonic sort/merge kernel).  Partner fetch = sublane roll; direction
masks from iota.  Reports element-stages/second — the single number
that decides whether a Mosaic merge kernel can beat XLA's batched sort
(~104 G elt-stages/s measured via b512).
"""
import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = 512            # rows per tile: tile = 64K int32 lanes
    TILES = 96         # grid size; total 6M elements
    STAGES = 45        # one b512-equivalent worth of stages

    def kernel(hi_ref, lo_ref, oh_ref, ol_ref):
        h = hi_ref[:]
        l = lo_ref[:]
        rows = h.shape[0]
        riota = lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
        # STAGES compare-exchange stages at cycling row distances
        for t in range(STAGES):
            d = int(os.environ.get('DMIN', 1)) << (t % 5)  # row distance
            up = pltpu.roll(h, rows - d, 0)
            dn = pltpu.roll(h, d, 0)
            upl = pltpu.roll(l, rows - d, 0)
            dnl = pltpu.roll(l, d, 0)
            bit = (riota & d) != 0
            ph = jnp.where(bit, dn, up)
            pl_ = jnp.where(bit, dnl, upl)
            gt = (h > ph) | ((h == ph) & (l > pl_))
            want_min = ~bit
            take_partner = want_min == gt
            h = jnp.where(take_partner, ph, h)
            l = jnp.where(take_partner, pl_, l)
        oh_ref[:] = h
        ol_ref[:] = l

    @jax.jit
    def run(hi, lo):
        oh, ol = pl.pallas_call(
            kernel,
            grid=(TILES,),
            in_specs=[
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((TILES * R, 128), jnp.int32),
                jax.ShapeDtypeStruct((TILES * R, 128), jnp.int32),
            ],
        )(hi, lo)
        return oh[0, 0] + ol[-1, -1]

    n = TILES * R * 128
    rng = np.random.default_rng(0)
    with jax.enable_x64(False):
        hi = jnp.asarray(rng.integers(0, 1 << 31, (TILES * R, 128),
                                      dtype=np.int64).astype(np.int32))
        lo = jnp.asarray(rng.integers(0, 1 << 31, (TILES * R, 128),
                                      dtype=np.int64).astype(np.int32))
        t0 = time.perf_counter()
        _ = np.asarray(run(hi, lo))
        print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            _ = np.asarray(run(hi, lo))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        t = ts[len(ts) // 2] - 0.0447   # measured round trip
        t = max(t, ts[0] * 0.1)
        rate = n * STAGES / t
        print(json.dumps({
            "ms": round(t * 1e3, 2),
            "giga_elt_stages_per_s": round(rate / 1e9, 1),
            "equiv_full_sort_ms_6M": round(
                6.3e6 * 253 / rate * 1e3, 2),
        }))


if __name__ == "__main__":
    main()
