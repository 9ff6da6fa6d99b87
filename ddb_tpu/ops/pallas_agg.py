"""Pallas TPU kernel: single-pass fused filter + dense-group aggregate.

The flagship hot-path kernel (TPC-H Q1 shape): one sweep over the input
columns computes all (group x payload) sums at once in VMEM, vs the XLA
masked-loop path that re-reads the data once per group.

Design (see docs/PERF_NOTES.md):
* all device data is int32 — no int64 emulation on the VPU.  Wide values
  (disc_price ~2^36, charge ~2^40) are computed as LIMB PAIRS from int32
  inputs: ext = e_hi*2^16 + e_lo, so disc_price = (e_hi*m)*2^16 + e_lo*m
  with both factors int32-safe.
* v2 accumulation structure (the v1 kernel carry-normalized a 98K-element
  accumulator every 1024-row tile — ~500 VPU ops/row of pure overhead):
  - each grid step processes a (TS, 128) tile (TS sublanes, default 256
    => 32768 rows);
  - every payload is carried as one or two REDUCTION-SAFE int32 streams
    (each stream value <= ~2^23 per row), reduced in-tile to (8, 128)
    partials per group (sum over TS/8-row sublane chunks);
  - partials accumulate into an int32 scratch acc32[G, S, 8, 128];
  - every SPILL_EVERY steps acc32 spills its 16-bit limbs into int32
    lo/hi accumulators and resets, so the hot loop never carries.
  Exact for > 4e9 rows per launch.
* the host recombines limbs/lanes in exact int64 (tiny arrays).

Input contract: per-row bounds qty <= 2^20, disc/tax <= 2^10,
0 <= ext < 2^31 (TPC-H SF100 fits: qty<=5000, ext<=~1.1e7 cents).

Reference counterpart: the grouped-aggregate hot loop
(src/execution/aggregate_hashtable.cpp) — here the "hash table" is a
VMEM-resident dense accumulator grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

GROUPS = 6
PAYLOADS = 8        # qty, ext, disc, count, dpA, dpB, chA, chB
STREAMS = 11        # qty, e_hi, e_lo, disc, ones, dpA, dpB,
                    # chA_h, chA_l, chB_h, chB_l
_TS = 1024          # sublanes per grid step (rows/step = _TS * 128)
_TILE_ROWS = _TS * 128
# worst per-row stream bound: dpB = (ext & 0xFFFF) * (100 - disc)
_WORST_STREAM = 65535 * 100


def _kernel(qty_ref, ext_ref, disc_ref, tax_ref, ship_ref, gid_ref,
            cutoff_ref, out_ref, acc32, lo, hi, *, ts, spill_every):
    from jax.experimental import pallas as pl

    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        acc32[...] = jnp.zeros_like(acc32)
        lo[...] = jnp.zeros_like(lo)
        hi[...] = jnp.zeros_like(hi)

    qty = qty_ref[...]
    ext = ext_ref[...]
    disc = disc_ref[...]
    tax = tax_ref[...]
    ship = ship_ref[...]
    gid = gid_ref[...]
    cutoff = cutoff_ref[0]

    m = 100 - disc
    n = 100 + tax
    e_hi = ext >> 16
    e_lo = ext & 0xFFFF
    dpA = e_hi * m                  # disc_price = dpA*2^16 + dpB
    dpB = e_lo * m
    chA = dpA * n                   # charge = chA*2^16 + chB
    chB = dpB * n
    ones = jnp.ones_like(qty)
    streams = jnp.stack((qty, e_hi, e_lo, disc, ones, dpA, dpB,
                         chA >> 16, chA & 0xFFFF,
                         chB >> 16, chB & 0xFFFF))   # (S, TS, 128)

    cid = jnp.where(ship <= cutoff, gid, GROUPS)
    chunk = ts // 8
    cur = acc32[...]
    parts = []
    for g in range(GROUPS):
        mask = (cid == g).astype(jnp.int32)
        masked = streams * mask[None]
        parts.append(masked.reshape(STREAMS, 8, chunk, 128).sum(axis=2))
    acc32[...] = cur + jnp.stack(parts)

    spill = ((step + 1) % spill_every == 0) | (step == nsteps - 1)

    @pl.when(spill)
    def _spill():
        a = acc32[...]
        lo[...] = lo[...] + (a & 0xFFFF)
        hi[...] = hi[...] + (a >> 16)
        acc32[...] = jnp.zeros_like(a)

    @pl.when(step == nsteps - 1)
    def _flush():
        out_ref[0] = lo[...]
        out_ref[1] = hi[...]


@functools.partial(jax.jit,
                   static_argnames=("n_rows", "interpret", "tile_sublanes"))
def q1_fused_aggregate(qty, ext, disc, tax, ship, gid, cutoff, *, n_rows,
                       interpret=False, tile_sublanes=None):
    """All inputs int32 arrays of length n_rows (a multiple of 1024);
    gid in [0,6) (computed as rf*2+ls), padding rows must have
    ship > cutoff.  Returns int64 sums [GROUPS, PAYLOADS]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n_rows % 1024 == 0
    sublanes = n_rows // 128
    ts = tile_sublanes or _TS
    while sublanes % ts:
        ts //= 2
    steps = sublanes // ts
    # spill acc32 into the lo/hi limbs before the worst-bounded stream
    # (dpB) can overflow int32 in a per-lane-sublane chunk of ts//8 rows
    spill_every = max(1, int((2 ** 31 - 1) // (_WORST_STREAM * (ts // 8))))

    def rs(x):
        return x.reshape(sublanes, 128)

    block = pl.BlockSpec((ts, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    acc_shape = (GROUPS, STREAMS, 8, 128)
    # the engine runs with x64 enabled; Mosaic must see a pure-i32 module
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel, ts=ts, spill_every=spill_every),
            grid=(steps,),
            in_specs=[block] * 6 + [
                pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(
                (2,) + acc_shape, lambda i: (0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2,) + acc_shape, jnp.int32),
            scratch_shapes=[pltpu.VMEM(acc_shape, jnp.int32),
                            pltpu.VMEM(acc_shape, jnp.int32),
                            pltpu.VMEM(acc_shape, jnp.int32)],
            interpret=interpret,
        )(rs(qty), rs(ext), rs(disc), rs(tax), rs(ship), rs(gid),
          jnp.asarray([cutoff], dtype=jnp.int32))

    # recombine limbs + lanes exactly (tiny): stream sums, then payloads
    lo = out[0].astype(jnp.int64).sum(axis=(-1, -2))
    hi = out[1].astype(jnp.int64).sum(axis=(-1, -2))
    s = hi * (1 << 16) + lo                       # [GROUPS, STREAMS]
    qty_s, ehi_s, elo_s, disc_s, ones_s, dpA_s, dpB_s = (
        s[:, 0], s[:, 1], s[:, 2], s[:, 3], s[:, 4], s[:, 5], s[:, 6])
    chA_s = s[:, 7] * (1 << 16) + s[:, 8]
    chB_s = s[:, 9] * (1 << 16) + s[:, 10]
    ext_s = ehi_s * (1 << 16) + elo_s
    return jnp.stack((qty_s, ext_s, disc_s, ones_s, dpA_s, dpB_s,
                      chA_s, chB_s), axis=1)


def q1_results_from_sums(sums: np.ndarray):
    """[GROUPS, PAYLOADS] int64 -> per-group Q1 aggregates (host, exact).
    Returns dict of arrays: sum_qty, sum_base_price, sum_disc_price,
    sum_charge, sum_disc, count."""
    sums = np.asarray(sums)
    qty, ext, disc, cnt = sums[:, 0], sums[:, 1], sums[:, 2], sums[:, 3]
    dp = sums[:, 4] * (1 << 16) + sums[:, 5]
    ch = sums[:, 6] * (1 << 16) + sums[:, 7]
    return dict(sum_qty=qty, sum_base_price=ext, sum_disc_price=dp,
                sum_charge=ch, sum_disc=disc, count=cnt)


def reference_sums(qty, ext, disc, tax, ship, gid, cutoff):
    """Slow exact reference (numpy int64) for validating the kernel."""
    qty, ext, disc, tax, ship, gid = (np.asarray(x, dtype=np.int64)
                                      for x in (qty, ext, disc, tax,
                                                ship, gid))
    sel = ship <= cutoff
    m = 100 - disc
    n = 100 + tax
    e_hi, e_lo = ext >> 16, ext & 0xFFFF
    pl_ = (qty, ext, disc, np.ones_like(qty), e_hi * m, e_lo * m,
           e_hi * m * n, e_lo * m * n)
    out = np.zeros((GROUPS, PAYLOADS), dtype=np.int64)
    for g in range(GROUPS):
        mask = sel & (gid == g)
        for p, v in enumerate(pl_):
            out[g, p] = v[mask].sum()
    return out


# ---------------------------------------------------------------------------
# v3 kernel: 8 streams (vs v2's 11) via charge tax-factoring + disc/count
# bit-packing, partials folded STRAIGHT into 16-bit limb accumulators
# (no intermediate acc32 / spill cadence).
#
#   charge = disc_price * (100 + tax)  =>  Σcharge = 100*Σdp + Σ(dp*tax)
#   so the 4 charge limb streams of v2 become 2 tax-product streams;
#   disc (<= 100/row) and the count share one packed stream
#   (disc + 1<<16): chunk sums keep the fields bit-disjoint, so the lo
#   limb accumulates Σdisc and the hi limb accumulates the count.
#
# Contract (TPC-H): disc <= 100, tax <= 8, qty <= 2^20, 0 <= ext < 2^31,
# rows per launch <= 2^30 (limb accumulators stay int32-exact).
# ---------------------------------------------------------------------------

STREAMS3 = 8        # qty, e_hi, e_lo, packed(disc|count), dpA, dpB,
                    # dpA*tax, dpB*tax
_TS3 = 256          # sublanes per step => 32768 rows (chunk = 32 rows
                    # keeps the worst stream dpB*tax int32-safe)


def _kernel3(qty_ref, ext_ref, disc_ref, tax_ref, ship_ref, gid_ref,
             cutoff_ref, out_ref, lo, hi, *, ts):
    from jax.experimental import pallas as pl

    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        lo[...] = jnp.zeros_like(lo)
        hi[...] = jnp.zeros_like(hi)

    qty = qty_ref[...]
    ext = ext_ref[...]
    disc = disc_ref[...]
    tax = tax_ref[...]
    ship = ship_ref[...]
    gid = gid_ref[...]
    cutoff = cutoff_ref[0]

    m = 100 - disc
    e_hi = ext >> 16
    e_lo = ext & 0xFFFF
    dpA = e_hi * m
    dpB = e_lo * m
    packed = disc + (1 << 16)
    streams = jnp.stack((qty, e_hi, e_lo, packed, dpA, dpB,
                         dpA * tax, dpB * tax))       # (S, TS, 128)

    cid = jnp.where(ship <= cutoff, gid, GROUPS)
    chunk = ts // 8
    parts = []
    for g in range(GROUPS):
        mask = (cid == g).astype(jnp.int32)
        masked = streams * mask[None]
        parts.append(masked.reshape(STREAMS3, 8, chunk, 128).sum(axis=2))
    p = jnp.stack(parts)                  # (G, S, 8, 128)
    lo[...] = lo[...] + (p & 0xFFFF)
    hi[...] = hi[...] + (p >> 16)

    @pl.when(step == nsteps - 1)
    def _flush():
        out_ref[0] = lo[...]
        out_ref[1] = hi[...]


# ---------------------------------------------------------------------------
# v4 kernel: v3's 8 streams + v2's accumulation structure.
#
# Chip-measured generations (6M rows, v5e): v2 21.4e9 rows/s, v3
# 15.6e9, v4 22.1e9, v7 26.2e9 (0.77 of the 34.1e9 HBM roofline).
# v7 = v4 with the in-tile reduction reordered to whole-vreg adds
# (see below); keep v4 around as the A/B baseline.
#
# v3 lost to v2 on the chip despite 3 fewer streams because it folded
# partials into BOTH 16-bit limb accumulators on every grid step (~4 ops
# per accumulator element each step).  v4 splits the streams by width:
#   - 6 NARROW streams (row bound <= 2^23: qty, e_hi, e_lo,
#     packed(disc|count), dpA, dpB) accumulate into one int32 scratch and
#     spill limbs only every `spill_every` steps (v2 cadence; bound math
#     below keeps the packed stream's disc field clear of its count
#     field);
#   - 2 WIDE streams (dpA*tax, dpB*tax <= ~2^26) fold straight into
#     their limb accumulators each step (their chunk sums are too close
#     to 2^31 for a useful cadence).
# Same result contract as v2/v3.  Contract: disc <= 100, tax <= 8,
# qty <= 2^20, 0 <= ext < 2^31.
# ---------------------------------------------------------------------------

STREAMS4N = 6       # qty, e_hi, e_lo, packed(disc|count), dpA, dpB
STREAMS4W = 2       # dpA*tax, dpB*tax
_TS4 = 256
# worst narrow stream: dpB = (ext & 0xFFFF) * (100 - disc)
_WORST4N = 65535 * 100


def _kernel4(qty_ref, ext_ref, disc_ref, tax_ref, ship_ref, gid_ref,
             cutoff_ref, outn_ref, outw_ref, accn, lon, hin, low, hiw,
             *, ts, spill_every, vreg_reduce=False):
    from jax.experimental import pallas as pl

    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        accn[...] = jnp.zeros_like(accn)
        lon[...] = jnp.zeros_like(lon)
        hin[...] = jnp.zeros_like(hin)
        low[...] = jnp.zeros_like(low)
        hiw[...] = jnp.zeros_like(hiw)

    qty = qty_ref[...]
    ext = ext_ref[...]
    disc = disc_ref[...]
    tax = tax_ref[...]
    ship = ship_ref[...]
    gid = gid_ref[...]
    cutoff = cutoff_ref[0]

    m = 100 - disc
    e_hi = ext >> 16
    e_lo = ext & 0xFFFF
    dpA = e_hi * m
    dpB = e_lo * m
    packed = disc + (1 << 16)
    sn = jnp.stack((qty, e_hi, e_lo, packed, dpA, dpB))
    sw = jnp.stack((dpA * tax, dpB * tax))

    cid = jnp.where(ship <= cutoff, gid, GROUPS)
    chunk = ts // 8
    pn, pw = [], []
    for g in range(GROUPS):
        mask = (cid == g).astype(jnp.int32)
        if vreg_reduce:
            # v7: reduce over the OUTER sublane-block axis — every add
            # combines whole (8,128) vregs with no sublane shuffles
            # (measured +19% over the (8, chunk) order below)
            pn.append((sn * mask[None]).reshape(
                STREAMS4N, chunk, 8, 128).sum(axis=1))
            pw.append((sw * mask[None]).reshape(
                STREAMS4W, chunk, 8, 128).sum(axis=1))
        else:
            pn.append((sn * mask[None]).reshape(
                STREAMS4N, 8, chunk, 128).sum(axis=2))
            pw.append((sw * mask[None]).reshape(
                STREAMS4W, 8, chunk, 128).sum(axis=2))
    accn[...] = accn[...] + jnp.stack(pn)
    w = jnp.stack(pw)
    low[...] = low[...] + (w & 0xFFFF)
    hiw[...] = hiw[...] + (w >> 16)

    spill = ((step + 1) % spill_every == 0) | (step == nsteps - 1)

    @pl.when(spill)
    def _spill():
        a = accn[...]
        lon[...] = lon[...] + (a & 0xFFFF)
        hin[...] = hin[...] + (a >> 16)
        accn[...] = jnp.zeros_like(a)

    @pl.when(step == nsteps - 1)
    def _flush():
        outn_ref[0] = lon[...]
        outn_ref[1] = hin[...]
        outw_ref[0] = low[...]
        outw_ref[1] = hiw[...]


@functools.partial(jax.jit,
                   static_argnames=("n_rows", "interpret",
                                    "tile_sublanes", "vreg_reduce"))
def q1_fused_aggregate_v4(qty, ext, disc, tax, ship, gid, cutoff, *,
                          n_rows, interpret=False, tile_sublanes=None,
                          vreg_reduce=False):
    """v4 of the Q1 flagship kernel; same result contract as
    q1_fused_aggregate (int64 sums [GROUPS, PAYLOADS])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n_rows % 1024 == 0
    sublanes = n_rows // 128
    ts = tile_sublanes or _TS4
    while sublanes % ts:
        ts //= 2
    steps = sublanes // ts
    chunk = ts // 8
    # two binding constraints on the narrow-acc spill cadence:
    #   dpB chunk sums stay < 2^31, and the packed stream's disc field
    #   (<= 100/row) stays < 2^16 so it cannot carry into the count field
    spill_every = max(1, min(
        int((2 ** 31 - 1) // (_WORST4N * chunk)),
        int((2 ** 16 - 1) // (100 * chunk))))

    def rs(x):
        return x.reshape(sublanes, 128)

    block = pl.BlockSpec((ts, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    nshape = (GROUPS, STREAMS4N, 8, 128)
    wshape = (GROUPS, STREAMS4W, 8, 128)
    with jax.enable_x64(False):
        outn, outw = pl.pallas_call(
            functools.partial(_kernel4, ts=ts, spill_every=spill_every,
                              vreg_reduce=vreg_reduce),
            grid=(steps,),
            in_specs=[block] * 6 + [
                pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=[
                pl.BlockSpec((2,) + nshape, lambda i: (0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2,) + wshape, lambda i: (0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((2,) + nshape, jnp.int32),
                jax.ShapeDtypeStruct((2,) + wshape, jnp.int32)],
            scratch_shapes=[pltpu.VMEM(nshape, jnp.int32),
                            pltpu.VMEM(nshape, jnp.int32),
                            pltpu.VMEM(nshape, jnp.int32),
                            pltpu.VMEM(wshape, jnp.int32),
                            pltpu.VMEM(wshape, jnp.int32)],
            interpret=interpret,
        )(rs(qty), rs(ext), rs(disc), rs(tax), rs(ship), rs(gid),
          jnp.asarray([cutoff], dtype=jnp.int32))

    lon = outn[0].astype(jnp.int64).sum(axis=(-1, -2))
    hin = outn[1].astype(jnp.int64).sum(axis=(-1, -2))
    n = hin * (1 << 16) + lon                     # [GROUPS, STREAMS4N]
    loww = outw[0].astype(jnp.int64).sum(axis=(-1, -2))
    hiw = outw[1].astype(jnp.int64).sum(axis=(-1, -2))
    w = hiw * (1 << 16) + loww                    # [GROUPS, STREAMS4W]
    qty_s, ehi_s, elo_s = n[:, 0], n[:, 1], n[:, 2]
    # packed stream: lo limb = Σdisc, hi limb = count (fields disjoint
    # by the spill-cadence bound above)
    disc_s = lon[:, 3]
    cnt_s = hin[:, 3]
    dpA_s, dpB_s = n[:, 4], n[:, 5]
    dpAt_s, dpBt_s = w[:, 0], w[:, 1]
    ext_s = ehi_s * (1 << 16) + elo_s
    chA_s = 100 * dpA_s + dpAt_s
    chB_s = 100 * dpB_s + dpBt_s
    return jnp.stack((qty_s, ext_s, disc_s, cnt_s, dpA_s, dpB_s,
                      chA_s, chB_s), axis=1)


@functools.partial(jax.jit,
                   static_argnames=("n_rows", "interpret",
                                    "tile_sublanes"))
def q1_fused_aggregate_v3(qty, ext, disc, tax, ship, gid, cutoff, *,
                          n_rows, interpret=False, tile_sublanes=None):
    """v3 of the Q1 flagship kernel; same result contract as
    q1_fused_aggregate (int64 sums [GROUPS, PAYLOADS])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n_rows % 1024 == 0
    sublanes = n_rows // 128
    ts = tile_sublanes or _TS3
    while sublanes % ts:
        ts //= 2
    steps = sublanes // ts

    def rs(x):
        return x.reshape(sublanes, 128)

    block = pl.BlockSpec((ts, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    acc_shape = (GROUPS, STREAMS3, 8, 128)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel3, ts=ts),
            grid=(steps,),
            in_specs=[block] * 6 + [
                pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(
                (2,) + acc_shape, lambda i: (0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2,) + acc_shape, jnp.int32),
            scratch_shapes=[pltpu.VMEM(acc_shape, jnp.int32),
                            pltpu.VMEM(acc_shape, jnp.int32)],
            interpret=interpret,
        )(rs(qty), rs(ext), rs(disc), rs(tax), rs(ship), rs(gid),
          jnp.asarray([cutoff], dtype=jnp.int32))

    lo = out[0].astype(jnp.int64).sum(axis=(-1, -2))
    hi = out[1].astype(jnp.int64).sum(axis=(-1, -2))
    s = hi * (1 << 16) + lo                       # [GROUPS, STREAMS3]
    qty_s, ehi_s, elo_s = s[:, 0], s[:, 1], s[:, 2]
    # packed stream: lo limb = Σdisc, hi limb = count (bit-disjoint)
    disc_s = lo[:, 3]
    cnt_s = hi[:, 3]
    dpA_s, dpB_s = s[:, 4], s[:, 5]
    dpAt_s, dpBt_s = s[:, 6], s[:, 7]
    ext_s = ehi_s * (1 << 16) + elo_s
    chA_s = 100 * dpA_s + dpAt_s        # charge limbs, tax factored out
    chB_s = 100 * dpB_s + dpBt_s
    return jnp.stack((qty_s, ext_s, disc_s, cnt_s, dpA_s, dpB_s,
                      chA_s, chB_s), axis=1)


@functools.partial(jax.jit,
                   static_argnames=("n_rows", "interpret",
                                    "tile_sublanes"))
def q1_fused_aggregate_v7(qty, ext, disc, tax, ship, gid, cutoff, *,
                          n_rows, interpret=False, tile_sublanes=None):
    """v7 = v4 with the in-tile reduction over the OUTER sublane-block
    axis (whole-vreg adds, no sublane shuffles).  Chip-measured 26.2e9
    rows/s, 0.77 of HBM roofline — the current flagship."""
    return q1_fused_aggregate_v4(qty, ext, disc, tax, ship, gid, cutoff,
                                 n_rows=n_rows, interpret=interpret,
                                 tile_sublanes=tile_sublanes,
                                 vreg_reduce=True)


# ---------------------------------------------------------------------------
# Q6: selective filter + sum(ext * disc) — the BASELINE config-2 shape.
# One group, two narrow limb streams (sA = (ext>>16)*disc <= ~2^19,
# sB = (ext&0xFFFF)*disc <= ~2^20), same spill-cadence accumulator
# structure as the Q1 v4/v7 kernel.  Contract: 0 <= ext < 2^31,
# 0 <= disc <= 100, qty/ship int32.
# Reference counterpart: the fused scan+filter+ungrouped aggregate
# pipeline (src/execution/physical_operator.cpp pipeline fusion).
# ---------------------------------------------------------------------------

_Q6_STREAMS = 2
_WORST_Q6 = 65535 * 100


def _kernel_q6(qty_ref, ext_ref, disc_ref, ship_ref, cut_ref, out_ref,
               acc32, lo, hi, *, ts, spill_every):
    from jax.experimental import pallas as pl

    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        acc32[...] = jnp.zeros_like(acc32)
        lo[...] = jnp.zeros_like(lo)
        hi[...] = jnp.zeros_like(hi)

    qty = qty_ref[...]
    ext = ext_ref[...]
    disc = disc_ref[...]
    ship = ship_ref[...]
    cut = cut_ref[0]

    m = ((ship >= cut) & (ship < cut + 365)
         & (disc >= 5) & (disc <= 7) & (qty < 24)).astype(jnp.int32)
    sA = (ext >> 16) * disc
    sB = (ext & 0xFFFF) * disc
    s = jnp.stack((sA, sB)) * m[None]

    chunk = ts // 8
    # whole-vreg reduction over the outer sublane-block axis (v7 order)
    part = s.reshape(_Q6_STREAMS, chunk, 8, 128).sum(axis=1)
    acc32[...] = acc32[...] + part

    spill = ((step + 1) % spill_every == 0) | (step == nsteps - 1)

    @pl.when(spill)
    def _spill():
        a = acc32[...]
        lo[...] = lo[...] + (a & 0xFFFF)
        hi[...] = hi[...] + (a >> 16)
        acc32[...] = jnp.zeros_like(a)

    @pl.when(step == nsteps - 1)
    def _flush():
        out_ref[0] = lo[...]
        out_ref[1] = hi[...]


@functools.partial(jax.jit,
                   static_argnames=("n_rows", "interpret",
                                    "tile_sublanes"))
def q6_fused_filter_sum(qty, ext, disc, ship, cut, *, n_rows,
                        interpret=False, tile_sublanes=None):
    """Single-pass Q6: revenue = sum(ext * disc) over the selective
    predicate, returned as one exact int64 scalar."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n_rows % 1024 == 0
    sublanes = n_rows // 128
    ts = tile_sublanes or _TS4
    while sublanes % ts:
        ts //= 2
    steps = sublanes // ts
    chunk = ts // 8
    spill_every = max(1, int((2 ** 31 - 1) // (_WORST_Q6 * chunk)))

    def rs(x):
        return x.reshape(sublanes, 128)

    block = pl.BlockSpec((ts, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    ashape = (_Q6_STREAMS, 8, 128)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel_q6, ts=ts,
                              spill_every=spill_every),
            grid=(steps,),
            in_specs=[block] * 4 + [
                pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(
                (2,) + ashape, lambda i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2,) + ashape, jnp.int32),
            scratch_shapes=[pltpu.VMEM(ashape, jnp.int32),
                            pltpu.VMEM(ashape, jnp.int32),
                            pltpu.VMEM(ashape, jnp.int32)],
            interpret=interpret,
        )(rs(qty), rs(ext), rs(disc), rs(ship),
          jnp.asarray([cut], dtype=jnp.int32))

    lo = out[0].astype(jnp.int64).sum(axis=(-1, -2))
    hi = out[1].astype(jnp.int64).sum(axis=(-1, -2))
    s = hi * (1 << 16) + lo                       # [streams]
    return (s[0] << 16) + s[1]


def q6_reference(qty, ext, disc, ship, cut):
    """Exact numpy oracle for q6_fused_filter_sum."""
    m = ((ship >= cut) & (ship < cut + 365)
         & (disc >= 5) & (disc <= 7) & (qty < 24))
    return int((ext.astype(np.int64) * disc)[m].sum())
