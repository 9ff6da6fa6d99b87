"""ORDER BY / LIMIT / compaction kernels.

Replaces the reference's external radix/merge sort stack
(reference: src/common/sorting/sorted_run.cpp, sorted_run_merger.hpp,
operator/order/physical_order.cpp) with a single multi-operand `lax.sort`
over encoded keys (see ops/sortkey.py) — XLA lowers this to a vectorized
bitonic/merge network on TPU.
"""

from __future__ import annotations

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np


def _bits_needed(op):
    """Scalar int32: bits to represent (op - min(op)) — 64 if the span
    overflows int64 (forces the general path)."""
    v = op.astype(jnp.int64)
    span = jnp.max(v) - jnp.min(v)
    nb = jnp.int32(64) - lax.clz(span).astype(jnp.int32)
    return jnp.where(span < 0, jnp.int32(64), nb)


def sort_permutation(key_ops, sel):
    """Permutation putting live rows in key order first, dead rows last.

    Adaptive key narrowing (TPU analog of the reference's minimal-width
    radix key normalization, src/common/sorting/sort.cpp create_sort_key
    + sorted_run.cpp ska_sort on narrow prefixes): when the combined
    value spans of all key operands + the row id fit in 63 bits, pack
    everything into ONE int64 and run a single-operand `lax.sort` —
    ~2x fewer bitonic bytes/stage than the multi-operand sort.  The
    span check and both branches live in-graph (`lax.cond`), so one
    compiled executable adapts per batch without host sync."""
    cap = sel.shape[0]
    rowid = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    invalid = (~sel).astype(jnp.int32)
    rid_bits = int(max(1, np.ceil(np.log2(max(cap, 2)))))

    ops64 = [op.astype(jnp.int64) for op in key_ops]
    mins = [jnp.min(v) for v in ops64]
    bits = [_bits_needed(op) for op in key_ops]
    total = jnp.int32(1 + rid_bits)
    for b in bits:
        total = total + b

    def packed(_):
        acc = invalid.astype(jnp.int64)
        for v, mn, b in zip(ops64, mins, bits):
            acc = (acc << b.astype(jnp.int64)) | (v - mn)
        acc = (acc << rid_bits) | rowid.astype(jnp.int64)
        (skey,) = lax.sort([acc], num_keys=1, is_stable=False)
        return (skey & ((1 << rid_bits) - 1)).astype(jnp.int32)

    def general(_):
        out = lax.sort([invalid, *key_ops, rowid],
                       num_keys=len(key_ops) + 1, is_stable=True)
        return out[-1]

    return lax.cond(total <= 63, packed, general, None)


def apply_permutation(batch_cols, sel, perm):
    """Gather all columns + sel through a permutation."""
    new_cols = []
    for data, nulls in batch_cols:
        new_cols.append((data[perm], nulls[perm] if nulls is not None
                         else None))
    return new_cols, sel[perm]


def limit_mask(sel, offset: int, limit: int):
    """Keep live rows with ordinal in [offset, offset+limit)."""
    pos = jnp.cumsum(sel.astype(jnp.int64)) - 1
    keep = (pos >= offset) & (pos < offset + limit)
    return sel & keep


def compact_permutation(sel):
    """Stable permutation moving live rows to the front."""
    cap = sel.shape[0]
    rowid = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    invalid = (~sel).astype(jnp.int32)
    _, perm = lax.sort([invalid, rowid], num_keys=2)
    return perm
