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


def sort_permutation(key_ops, sel):
    """Permutation putting live rows in key order first, dead rows last."""
    cap = sel.shape[0]
    rowid = lax.broadcasted_iota(jnp.int32, (cap,), 0)
    invalid = (~sel).astype(jnp.int32)
    out = lax.sort([invalid, *key_ops, rowid], num_keys=len(key_ops) + 1,
                   is_stable=True)
    return out[-1]


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
