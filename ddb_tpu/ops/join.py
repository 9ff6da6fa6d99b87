"""Equi-join kernels: sorted build + merge-based probe — scatter-free.

TPU-native replacement for the reference's JoinHashTable
(reference: src/execution/join_hashtable.cpp build :395+, probe
GetRowPointers :250-390, chained ScanStructure::Next*).  No pointers, no
CAS, and no XLA scatter (which serializes on TPU):

  build   = sort build keys (run starts/ends computed by forward/backward
            scans — the run-length index IS the hash table)
  probe   = ONE merge sort of build+probe keys; a forward-fill segmented
            scan hands every probe row its key's (start, end) build run;
            an inverse-permutation sort restores probe order
  expand  = merge sort of cumulative match counts against output positions
            + forward-fill, giving each output row its (probe row, build
            slot) — the analog of chunked HAVE_MORE_OUTPUT probing
            (reference: physical_hash_join.cpp:973-1045)

Measured on v5e @6M rows: merge probe ~3 sorts (~15 ms each) vs 950 ms for
binary-search probing (log-n random gathers) and >500 ms for any scatter.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

_KEY_SENTINEL = np.int64(2**63 - 1)   # invalid rows sort last, never match


class BuildTable(NamedTuple):
    skey: jax.Array       # [bcap] int64 keys, sorted, invalid = sentinel
    srow: jax.Array       # [bcap] int32 original row per sorted slot
    rstart: jax.Array     # [bcap] int32 run start (sorted slot) per slot
    rend: jax.Array       # [bcap] int32 run end (inclusive) per slot
    nbuild: jax.Array     # scalar int32 valid build rows


def build(key: jax.Array, key_null, sel: jax.Array) -> BuildTable:
    """Sort build keys; NULL keys never match (SQL equi-join)."""
    live = sel if key_null is None else (sel & ~key_null)
    n = key.shape[0]
    k = jnp.where(live, key.astype(jnp.int64), _KEY_SENTINEL)
    rowid = lax.broadcasted_iota(jnp.int32, (n,), 0)
    skey, srow = lax.sort([k, rowid], num_keys=1, is_stable=True)
    pos = lax.broadcasted_iota(jnp.int32, (n,), 0)
    is_start = jnp.concatenate([jnp.ones(1, dtype=bool),
                                skey[1:] != skey[:-1]])
    rstart = lax.associative_scan(jnp.maximum,
                                  jnp.where(is_start, pos, 0))
    is_last = jnp.concatenate([skey[1:] != skey[:-1],
                               jnp.ones(1, dtype=bool)])
    # nearest is_last position at-or-after each slot = reversed cummin
    rend = lax.associative_scan(
        jnp.minimum,
        jnp.where(is_last, pos, np.int32(2**31 - 1))[::-1])[::-1] \
        .astype(jnp.int32)
    return BuildTable(skey, srow, rstart.astype(jnp.int32), rend,
                      live.astype(jnp.int32).sum())


def probe_ranges(bt: BuildTable, pkey: jax.Array, pkey_null,
                 psel: jax.Array):
    """Per probe row: (lo, count) of matching sorted build slots.

    Scan structure: in the merged (key, tag) order every build run's
    carried (rstart, rend) is MONOTONE nondecreasing over build rows
    (build keys ascend, run starts ascend with them), so forward-fill
    is a plain masked cummax — no custom-combine associative_scan.
    That keeps the XLA graph small enough to compile through the
    remote tunnel (a generic tuple-scan version took >60 min) and is
    faster at runtime (one fused max-scan per carried value)."""
    live = psel if pkey_null is None else (psel & ~pkey_null)
    nb = bt.skey.shape[0]
    npr = pkey.shape[0]
    pk = jnp.where(live, pkey.astype(jnp.int64), _KEY_SENTINEL)

    # merged sort: build rows (tag 0) before probe rows (tag 1) on ties
    keys = jnp.concatenate([bt.skey, pk])
    tag = jnp.concatenate([jnp.zeros(nb, jnp.int32),
                           jnp.ones(npr, jnp.int32)])
    idx = lax.broadcasted_iota(jnp.int32, (nb + npr,), 0)
    # carried per build row: run start, run end (rows of one key run all
    # carry the same pair, so equal-key reordering is harmless)
    cstart = jnp.concatenate([bt.rstart, jnp.zeros(npr, jnp.int32)])
    cend = jnp.concatenate([bt.rend, jnp.zeros(npr, jnp.int32)])

    mkeys, mtag, midx, mstart, mend = lax.sort(
        [keys, tag, idx, cstart, cend], num_keys=2, is_stable=False)

    is_build = mtag == 0
    n = nb + npr
    pos = lax.broadcasted_iota(jnp.int32, (n,), 0)
    # key-run starts; a probe row matches iff a build row exists in its
    # own key run (builds sort before probes at equal keys)
    is_start = jnp.concatenate([jnp.ones(1, dtype=bool),
                                mkeys[1:] != mkeys[:-1]])
    run_start_pos = lax.cummax(jnp.where(is_start, pos, 0))
    last_build_pos = lax.cummax(jnp.where(is_build, pos, -1))
    match = last_build_pos >= run_start_pos
    fstart = lax.cummax(jnp.where(is_build, mstart, -1))
    fend = lax.cummax(jnp.where(is_build, mend, -1))

    cnt_m = jnp.where(match, fend - fstart + 1, 0)
    lo_m = jnp.where(match, jnp.maximum(fstart, 0), 0)

    # inverse permutation: restore original order by sorting on idx
    _, lo_all, cnt_all = lax.sort([midx, lo_m, cnt_m], num_keys=1,
                                  is_stable=False)
    lo = lo_all[nb:]
    cnt = cnt_all[nb:]
    ok = live & (pk != _KEY_SENTINEL)
    return (jnp.where(ok, lo, 0).astype(jnp.int32),
            jnp.where(ok, cnt, 0).astype(jnp.int32))


def range_probe(bt: BuildTable, pkey: jax.Array, pkey_null,
                psel: jax.Array, op: str):
    """Per probe row: (lo, count) of build slots with `probe <op> build`
    over ORDER-PRESERVING int64 keys (sortkey._orderable encodings).

    The TPU analog of the reference's PiecewiseMergeJoin
    (reference: operator/join/physical_piecewise_merge_join.cpp): the build
    side is sorted, so every inequality match set is a contiguous prefix or
    suffix of the sorted build array.  One merged sort of build+probe keys
    yields, per probe row, its rank among build keys (count_le) and its
    equal-key run length (count_eq) — both scatter-free.
    """
    live = psel if pkey_null is None else (psel & ~pkey_null)
    nb = bt.skey.shape[0]
    npr = pkey.shape[0]
    pk = jnp.where(live, pkey.astype(jnp.int64), _KEY_SENTINEL)

    keys = jnp.concatenate([bt.skey, pk])
    tag = jnp.concatenate([jnp.zeros(nb, jnp.int32),
                           jnp.ones(npr, jnp.int32)])
    idx = lax.broadcasted_iota(jnp.int32, (nb + npr,), 0)
    cstart = jnp.concatenate([bt.rstart, jnp.zeros(npr, jnp.int32)])
    cend = jnp.concatenate([bt.rend, jnp.zeros(npr, jnp.int32)])

    mkeys, mtag, midx, mstart, mend = lax.sort(
        [keys, tag, idx, cstart, cend], num_keys=2, is_stable=False)

    is_build = mtag == 0
    n = nb + npr
    pos = lax.broadcasted_iota(jnp.int32, (n,), 0)
    # monotone carried values -> masked-cummax forward fill (see
    # probe_ranges)
    is_start = jnp.concatenate([jnp.ones(1, dtype=bool),
                                mkeys[1:] != mkeys[:-1]])
    run_start_pos = lax.cummax(jnp.where(is_start, pos, 0))
    last_build_pos = lax.cummax(jnp.where(is_build, pos, -1))
    in_run = last_build_pos >= run_start_pos
    fstart = lax.cummax(jnp.where(is_build, mstart, -1))
    fend = lax.cummax(jnp.where(is_build, mend, -1))

    probe_rank = jnp.cumsum(mtag)                 # probes at-or-before, incl
    count_le = pos + 1 - probe_rank               # build rows with key <= v
    eq = jnp.where(in_run, fend - fstart + 1, 0)
    count_lt = count_le - eq

    _, le_all, lt_all = lax.sort(
        [midx, count_le, count_lt], num_keys=1, is_stable=False)
    count_le = le_all[nb:]
    count_lt = lt_all[nb:]

    nvalid = bt.nbuild
    if op == "<":          # probe < build: suffix after count_le
        lo, cnt = count_le, nvalid - count_le
    elif op == "<=":       # probe <= build: suffix after count_lt
        lo, cnt = count_lt, nvalid - count_lt
    elif op == ">":        # probe > build: prefix of count_lt
        lo, cnt = jnp.zeros_like(count_lt), count_lt
    elif op == ">=":
        lo, cnt = jnp.zeros_like(count_le), count_le
    else:
        raise ValueError(f"range_probe op {op}")
    ok = live & (pk != _KEY_SENTINEL)
    cnt = jnp.maximum(cnt, 0)
    return (jnp.where(ok, lo, 0).astype(jnp.int32),
            jnp.where(ok, cnt, 0).astype(jnp.int32))


def asof_probe(rk: jax.Array, rt: jax.Array, r_live: jax.Array,
               lk: jax.Array, lt: jax.Array, l_live: jax.Array,
               strict: bool):
    """AsOf join: per probe row, the single LATEST build row with equal
    key and build-time <= probe-time (< if strict).  Keys are
    equality-preserving int64; times are ORDER-PRESERVING int64 encodings
    (pre-negate both sides to express >=-directional asof as <=).

    Reference: operator/join/physical_asof_join.cpp — theirs is a
    partitioned merge; ours is one combined (key, time) sort + a
    forward-fill, scatter-free.  Returns (BuildTable, lo, cnt) compatible
    with the generic expand/outer machinery (cnt ∈ {0,1})."""
    nb = rk.shape[0]
    npr = lk.shape[0]
    bkey = jnp.where(r_live, rk.astype(jnp.int64), _KEY_SENTINEL)
    pkey = jnp.where(l_live, lk.astype(jnp.int64), _KEY_SENTINEL)

    # sorted-build srow (stable: same slot numbering as the merged sort)
    rowid = lax.broadcasted_iota(jnp.int32, (nb,), 0)
    skey, _, srow = lax.sort([bkey, rt, rowid], num_keys=2, is_stable=True)

    keys1 = jnp.concatenate([bkey, pkey])
    keys2 = jnp.concatenate([rt, lt])
    # inclusive: builds BEFORE probes at equal (key, time); strict: after
    if strict:
        tag = jnp.concatenate([jnp.ones(nb, jnp.int32),
                               jnp.zeros(npr, jnp.int32)])
    else:
        tag = jnp.concatenate([jnp.zeros(nb, jnp.int32),
                               jnp.ones(npr, jnp.int32)])
    idx = lax.broadcasted_iota(jnp.int32, (nb + npr,), 0)

    mk, mt, mtag, midx = lax.sort([keys1, keys2, tag, idx],
                                  num_keys=3, is_stable=True)
    is_build = midx < nb
    # build keys ascend in merged order -> masked-cummax forward fill
    # of the latest build key at-or-before each row
    fk = lax.cummax(jnp.where(is_build, mk, jnp.int64(-2**63)))
    nbuilds = jnp.cumsum(is_build.astype(jnp.int32))   # at-or-before, incl
    lo_m = jnp.maximum(nbuilds - 1, 0)
    found_m = (fk == mk) & (mk != _KEY_SENTINEL)

    _, lo_all, f_all = lax.sort(
        [midx, lo_m, found_m.astype(jnp.int32)], num_keys=1,
        is_stable=False)
    lo = lo_all[nb:]
    found = (f_all[nb:] > 0) & l_live
    bt = BuildTable(skey, srow,
                    jnp.zeros(nb, jnp.int32), jnp.zeros(nb, jnp.int32),
                    r_live.astype(jnp.int32).sum())
    return bt, lo.astype(jnp.int32), found.astype(jnp.int32)


def match_total(count) -> jax.Array:
    return count.astype(jnp.int64).sum()


def expand(lo, count, out_cap: int):
    """Flatten match ranges: output j -> (probe row pi, build slot bpos).

    Merge-based: sort cumulative counts against output positions, forward
    fill (probe index, exclusive prefix, lo), restore output order."""
    n = count.shape[0]
    cum = jnp.cumsum(count.astype(jnp.int64))          # inclusive
    total = cum[-1]
    excl = cum - count                                  # exclusive prefix

    j = lax.broadcasted_iota(jnp.int64, (out_cap,), 0)
    # merge keys: probe thresholds (excl) vs output positions (j).
    # probe row i owns outputs [excl[i], cum[i]); place threshold rows
    # BEFORE output rows at equal key so forward-fill assigns correctly.
    keys = jnp.concatenate([excl, j])
    tag = jnp.concatenate([jnp.zeros(n, jnp.int32),
                           jnp.ones(out_cap, jnp.int32)])
    idx = lax.broadcasted_iota(jnp.int32, (n + out_cap,), 0)
    # sources in merged order keep ascending probe index (stable sort,
    # nondecreasing excl), so (pid << 32 | lo) and excl are monotone
    # over live sources -> masked-cummax forward fill (empty ranges are
    # masked out up front and never own outputs)
    src_live = count.astype(jnp.int64) > 0
    pid32 = lax.broadcasted_iota(jnp.int64, (n,), 0)
    packed_src = jnp.where(src_live,
                           (pid32 << 32) | lo.astype(jnp.int64),
                           jnp.int64(-1))
    cpack = jnp.concatenate([packed_src, jnp.full(out_cap, -1,
                                                  jnp.int64)])
    cexcl = jnp.concatenate([jnp.where(src_live, excl, jnp.int64(-1)),
                             jnp.full(out_cap, -1, jnp.int64)])

    mk, mtag, midx, mpack, mexcl = lax.sort(
        [keys, tag, idx, cpack, cexcl], num_keys=2, is_stable=True)
    fpack = lax.cummax(mpack)
    fexcl = lax.cummax(mexcl)

    _, opack, oexcl = lax.sort([midx, fpack, fexcl], num_keys=1,
                               is_stable=False)
    pi = (opack[n:] >> 32).astype(jnp.int32)
    off = (j - oexcl[n:]).astype(jnp.int32)
    bpos = (opack[n:] & 0x7FFFFFFF).astype(jnp.int32) + off
    valid = j < total
    return (jnp.where(valid, pi, 0),
            jnp.clip(jnp.where(valid, bpos, 0), 0, None), valid)


def matched_build_mask(bt: BuildTable, lo, count, cap_build: int):
    """bool[cap_build] — which ORIGINAL build rows had >=1 probe match.
    (RIGHT/FULL joins; reference tracks found_match flags,
    join_hashtable.hpp:70-118.)

    Scatter-free: a sorted build slot s is covered iff some probe range
    [lo, lo+cnt) contains it; equivalently (#starts <= s) > (#ends <= s).
    Both counts come from one merge sort against slot positions."""
    n = bt.skey.shape[0]
    has = count > 0
    starts = jnp.where(has, lo, n).astype(jnp.int64)
    ends = jnp.where(has, lo + count, n).astype(jnp.int64)
    npr = starts.shape[0]
    slots = lax.broadcasted_iota(jnp.int64, (n,), 0)

    # events: +1 at start, -1 at end; slots query the running sum.
    # sort [position, kind] with events before queries at equal position
    # for starts (kind 0) and after? start at s covers s; end at e stops
    # covering at e. Order at equal pos: start(0) < query(1) < end(2)?
    # coverage(s) = #starts<=s - #ends<=s.
    pos = jnp.concatenate([starts, ends, slots])
    kind = jnp.concatenate([jnp.zeros(npr, jnp.int32),
                            jnp.zeros(npr, jnp.int32) + 2,
                            jnp.ones(n, jnp.int32)])
    delta = jnp.concatenate([
        has.astype(jnp.int32),
        -has.astype(jnp.int32),
        jnp.zeros(n, jnp.int32)])
    idx = lax.broadcasted_iota(jnp.int32, (2 * npr + n,), 0)
    # ends have kind 2 (after queries): end at e still covers slot e-1 but
    # not e; with end sorted AFTER query at pos e, a query at e sees the
    # -1 not yet applied — wrong; we want ends applied BEFORE queries at
    # the same position. Use kind: start 0, end 1, query 2.
    kind = jnp.concatenate([jnp.zeros(npr, jnp.int32),
                            jnp.ones(npr, jnp.int32),
                            jnp.full(n, 2, jnp.int32)])
    mpos, mkind, midx, mdelta = lax.sort([pos, kind, idx, delta],
                                         num_keys=2, is_stable=True)
    running = jnp.cumsum(mdelta)
    _, cov = lax.sort([midx, running], num_keys=1, is_stable=False)
    covered = cov[2 * npr:] > 0
    # map sorted-slot coverage back to original rows: carry through sort
    _, covo = lax.sort([bt.srow, covered.astype(jnp.int32)], num_keys=1,
                       is_stable=False)
    out = covo > 0
    if out.shape[0] != cap_build:
        out = out[:cap_build]
    return out
