"""Columnar batch: the unit of data flowing between operators.

TPU-native replacement for the reference's DataChunk/Vector/SelectionVector
(reference: src/include/duckdb/common/types/data_chunk.hpp:43,
vector.hpp:79, selection_vector.hpp:26).  Differences by design:

* Fixed static capacity (shape) per batch; a boolean row mask `sel` plus a
  `count` scalar replace SelectionVector indirection — filters are
  branch-free mask ANDs, and compaction is an explicit gather scheduled by
  the host driver with power-of-two capacity bucketing (bounds recompiles).
* NULLs are per-column boolean masks (reference: ValidityMask bitmask,
  common/types/validity_mask.hpp) — bool arrays vectorize cleanly on the VPU.
* Schema (names/types/string dictionaries) is host-side metadata; the device
  pytree contains only dense arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .types import DataType

# Capacity bucketing: round row counts up to limit distinct compiled shapes.
_MIN_CAP = 128


def bucket_capacity(n: int) -> int:
    """Round n up to a power of two (>=_MIN_CAP) to bound recompilations."""
    c = _MIN_CAP
    while c < n:
        c <<= 1
    return c


class Column(NamedTuple):
    data: jax.Array              # [cap] physical values (lo limb if wide)
    nulls: Optional[jax.Array]   # [cap] bool, True => NULL; None => no nulls
    # optional high limb for wide (i128-style) values: value = hi*2^32 + data
    # (data then holds the unsigned low 32 bits in an int64 lane); produced
    # by wide SUM accumulation (ops/aggregate.py), None everywhere else
    hi: Optional[jax.Array] = None


class Batch(NamedTuple):
    """Device pytree: tuple of columns + row mask + live-row count."""
    columns: tuple                 # tuple[Column, ...]
    sel: jax.Array                 # [cap] bool, True => row is live
    count: jax.Array               # scalar int32, number of live rows

    @property
    def capacity(self) -> int:
        return int(self.sel.shape[0])

    def column(self, i: int) -> Column:
        return self.columns[i]

    def with_columns(self, columns) -> "Batch":
        return Batch(tuple(columns), self.sel, self.count)


@dataclass(frozen=True)
class Field:
    name: str
    dtype: DataType
    strdict: Any = None   # StringDictionary for VARCHAR columns


@dataclass(frozen=True)
class Schema:
    fields: tuple

    def __post_init__(self):
        object.__setattr__(self, "fields", tuple(self.fields))

    @property
    def names(self):
        return [f.name for f in self.fields]

    @property
    def types(self):
        return [f.dtype for f in self.fields]

    def __len__(self):
        return len(self.fields)

    def index_of(self, name: str) -> int:
        for i, f in enumerate(self.fields):
            if f.name == name:
                return i
        # SQL identifiers are case-insensitive
        low = name.lower()
        for i, f in enumerate(self.fields):
            if f.name.lower() == low:
                return i
        raise KeyError(name)

    def field(self, i: int) -> Field:
        return self.fields[i]

    def rename(self, names) -> "Schema":
        return Schema(tuple(replace(f, name=n)
                            for f, n in zip(self.fields, names)))


def make_batch(arrays: Sequence[np.ndarray],
               nulls: Sequence[Optional[np.ndarray]] = None,
               count: Optional[int] = None,
               capacity: Optional[int] = None) -> Batch:
    """Build a device Batch from host arrays, padding to capacity."""
    n = len(arrays[0]) if count is None else count
    cap = bucket_capacity(n) if capacity is None else capacity
    cols = []
    for i, a in enumerate(arrays):
        a = np.asarray(a)
        pad = cap - len(a)
        if pad:
            a = np.concatenate([a, np.zeros(pad, dtype=a.dtype)])
        nm = None
        if nulls is not None and nulls[i] is not None:
            m = np.asarray(nulls[i], dtype=bool)
            if pad:
                m = np.concatenate([m, np.zeros(pad, dtype=bool)])
            if m.any():
                nm = jnp.asarray(m)
        cols.append(Column(jnp.asarray(a), nm))
    sel = np.zeros(cap, dtype=bool)
    sel[:n] = True
    return Batch(tuple(cols), jnp.asarray(sel), jnp.asarray(np.int32(n)))


def batch_to_host(batch: Batch, schema: Schema):
    """Materialize live rows to host as a list of numpy arrays + null masks.

    Invalid (masked-out) rows are dropped; row order is preserved."""
    sel = np.asarray(batch.sel)
    out_data, out_nulls = [], []
    for col in batch.columns:
        d = np.asarray(col.data)[sel]
        if col.hi is not None:
            # `data` is the composed (possibly wrapped) int64; exact value
            # = hi * 2^32 + low 32 bits.  Reconstruct as Python ints.
            h = np.asarray(col.hi)[sel].astype(object)
            d = h * (1 << 32) + (d & np.int64(0xFFFFFFFF)).astype(object)
        m = np.asarray(col.nulls)[sel] if col.nulls is not None else None
        out_data.append(d)
        out_nulls.append(m)
    return out_data, out_nulls


def host_compact_indices(batch: Batch):
    """Host helper: indices of live rows, in order."""
    return np.nonzero(np.asarray(batch.sel))[0]
