"""Equi-join kernels: sorted build + vectorized binary-search probe.

TPU-native replacement for the reference's JoinHashTable
(reference: src/execution/join_hashtable.cpp build :395+, probe
GetRowPointers :250-390, chained ScanStructure::Next*).  No pointers, no
CAS: the "hash table" is the build side sorted by key (a run-length index),
probing is `searchsorted` (log2(n) vectorized gather passes — the TPU analog
of bucket-chain following), and variable-cardinality inner-match expansion
is two-pass: count -> host chooses a bucketed output capacity -> expand
(the analog of HAVE_MORE_OUTPUT chunked probing,
reference: physical_hash_join.cpp:973-1045).

All join types are expressed on top of two primitives:
  probe_ranges():  per-probe-row [lo, hi) match range in sorted build order
  expand():        flatten ranges into (probe_row, build_row) pairs
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

_KEY_SENTINEL = np.int64(2**63 - 1)   # invalid build rows sort last


class BuildTable(NamedTuple):
    skey: jax.Array     # [bcap] int64 keys, sorted, invalid rows = sentinel
    srow: jax.Array     # [bcap] int32 original row index per sorted slot
    nbuild: jax.Array   # scalar int32 count of valid build rows


def build(key: jax.Array, key_null, sel: jax.Array) -> BuildTable:
    """Sort build keys; NULL keys never match (SQL equi-join semantics)."""
    live = sel if key_null is None else (sel & ~key_null)
    k = jnp.where(live, key.astype(jnp.int64), _KEY_SENTINEL)
    rowid = lax.broadcasted_iota(jnp.int32, (key.shape[0],), 0)
    skey, srow = lax.sort([k, rowid], num_keys=1, is_stable=True)
    return BuildTable(skey, srow, live.astype(jnp.int32).sum())


def probe_ranges(bt: BuildTable, pkey: jax.Array, pkey_null, psel: jax.Array):
    """Per probe row: (lo, count) of matching build slots."""
    live = psel if pkey_null is None else (psel & ~pkey_null)
    pk = pkey.astype(jnp.int64)
    lo = jnp.searchsorted(bt.skey, pk, side="left")
    hi = jnp.searchsorted(bt.skey, pk, side="right")
    count = jnp.where(live & (pk != _KEY_SENTINEL), hi - lo, 0)
    return lo.astype(jnp.int32), count.astype(jnp.int32)


def match_total(count) -> jax.Array:
    return count.astype(jnp.int64).sum()


def expand(lo, count, out_cap: int):
    """Flatten match ranges: output j -> (probe row pi, build slot bpos).

    Returns (pi, bpos, valid) arrays of length out_cap.  j maps to the
    probe row via searchsorted over the cumulative match counts."""
    cum = jnp.cumsum(count.astype(jnp.int64))
    total = cum[-1]
    j = lax.broadcasted_iota(jnp.int64, (out_cap,), 0)
    pi = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
    pic = jnp.clip(pi, 0, count.shape[0] - 1)
    prev = jnp.where(pic > 0, cum[jnp.maximum(pic - 1, 0)], 0)
    off = (j - prev).astype(jnp.int32)
    bpos = lo[pic] + off
    valid = j < total
    return pic, jnp.clip(bpos, 0, lo.shape[0] - 1), valid


def matched_build_mask(bt: BuildTable, lo, count, cap_build: int):
    """bool[cap_build] — which ORIGINAL build rows had >=1 probe match.
    Used for RIGHT/FULL joins (reference tracks this with found_match flags,
    join_hashtable.hpp:70-118).  Marks sorted slots via +1/-1 range scatter
    then prefix-sum (branch-free difference array)."""
    n = bt.skey.shape[0]
    add = jnp.zeros(n + 1, dtype=jnp.int32)
    has = count > 0
    starts = jnp.where(has, lo, n)
    ends = jnp.where(has, jnp.minimum(lo + count, n), n)
    add = add.at[starts].add(1, mode="drop")
    add = add.at[ends].add(-1, mode="drop")
    covered = jnp.cumsum(add[:-1]) > 0
    # map sorted-slot coverage back to original row ids
    out = jnp.zeros(cap_build, dtype=bool)
    out = out.at[bt.srow].max(covered)
    return out
