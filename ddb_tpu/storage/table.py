"""In-memory columnar table storage.

Round-1 storage engine: host-resident numpy columns + lazily cached device
arrays, with per-column min/max/null statistics (zone-map analog,
reference: src/storage/statistics/) collected at ingest.  The reference's
RowGroup/ColumnSegment/compression stack (src/storage/table/) maps later to
tiled host->HBM streaming; on-TPU batches are whole-column for now.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

from ..batch import Batch, Field, Schema, make_batch
from ..storage.strings import StringDictionary
from .. import types as T
from ..types import DataType, TypeId


# reference: STANDARD_ROW_GROUPS_SIZE, src/include/duckdb/storage/
# storage_info.hpp:20
ROW_GROUP_SIZE = 122_880

# scan-skipping counters (EXPLAIN ANALYZE / tests read these)
SCAN_STATS = {"groups_total": 0, "groups_skipped": 0}


@dataclass
class ColumnStats:
    min: Any = None
    max: Any = None
    has_nulls: bool = False
    distinct_hint: Optional[int] = None   # e.g. dictionary size


@dataclass
class TableColumn:
    name: str
    dtype: DataType
    data: np.ndarray                      # physical values
    nulls: Optional[np.ndarray] = None    # bool mask, True => NULL
    strdict: Optional[StringDictionary] = None
    stats: ColumnStats = field(default_factory=ColumnStats)

    def compute_stats(self):
        live = self.data if self.nulls is None else self.data[~self.nulls]
        s = ColumnStats(has_nulls=bool(self.nulls is not None
                                       and self.nulls.any()))
        if len(live):
            if self.dtype.id != TypeId.VARCHAR or self.strdict is not None:
                s.min = live.min()
                s.max = live.max()
        if self.strdict is not None:
            s.distinct_hint = len(self.strdict)
        self.stats = s


class TableData:
    """A named table: columns + cached device batch."""

    def __init__(self, name: str, columns: List[TableColumn]):
        self.name = name
        self.columns = columns
        self._device_batch: Optional[Batch] = None
        # mutation stamp + last mutation kind drive lazy index refresh
        # (storage/index.py: pure appends merge incrementally)
        self.version = 0
        self.last_op: Optional[str] = None
        self.indexes: Dict[str, Any] = {}     # name -> SortedIndex
        for c in columns:
            if c.stats.min is None and not c.stats.has_nulls:
                c.compute_stats()

    def note_mutation(self, op: str):
        self.version += 1
        self.last_op = op

    def find_index(self, columns) -> Optional[Any]:
        """An index whose key columns equal `columns`, else one whose
        key is a superset starting with them (a (a,b) index serves
        equality lookups on (a,b); exact matches win)."""
        want = [c.lower() for c in columns]
        prefix_hit = None
        for ix in self.indexes.values():
            have = [c.lower() for c in ix.columns]
            if have == want:
                return ix
            if prefix_hit is None and have[:len(want)] == want:
                prefix_hit = ix
        return prefix_hit

    @property
    def num_rows(self) -> int:
        return len(self.columns[0].data) if self.columns else 0

    @property
    def schema(self) -> Schema:
        return Schema(tuple(Field(c.name, c.dtype, c.strdict)
                            for c in self.columns))

    def device_batch(self, column_indices=None) -> Batch:
        """Full-table batch on device (cached).  column_indices selects a
        projection; the cache holds the full batch and projections slice it.
        The buffer manager tracks bytes and LRU-evicts other tables' caches
        when over budget (reference: src/storage/buffer_manager.cpp)."""
        from .buffer import MANAGER
        if self._device_batch is None:
            arrays = [c.data for c in self.columns]
            nulls = [c.nulls for c in self.columns]
            self._device_batch = make_batch(arrays, nulls, self.num_rows)
        nbytes = sum(c.data.nbytes + (c.nulls.nbytes if c.nulls is not None
                                      else 0) for c in self.columns)
        MANAGER.note_use(self, nbytes)
        b = self._device_batch
        if column_indices is None:
            return b
        return Batch(tuple(b.columns[i] for i in column_indices),
                     b.sel, b.count)

    def device_batch_rows(self, column_indices, rows: np.ndarray) -> Batch:
        """Small batch of specific row ids (index point lookups): a host
        gather of O(k) rows feeds the device instead of the whole table
        (reference: index scan fallback in table_scan.cpp:77-250)."""
        cols = self.columns if column_indices is None else \
            [self.columns[i] for i in column_indices]
        arrays = [c.data[rows] for c in cols]
        nulls = [c.nulls[rows] if c.nulls is not None else None
                 for c in cols]
        return make_batch(arrays, nulls, len(rows))

    def invalidate_cache(self):
        self._device_batch = None
        self._rg_stats = None
        from .buffer import MANAGER
        MANAGER.drop(self)

    # ---- row groups (reference: src/storage/table/row_group.hpp:70 —
    # RowGroupCollection -> RowGroup(122880 rows) -> ColumnSegment with
    # per-segment zone maps driving scan skipping) -----------------------

    def row_group_stats(self, group_size: int = ROW_GROUP_SIZE):
        """Per-row-group per-column (min, max, has_nulls) zone maps,
        cached against the mutation stamp.  Entries are None where the
        column type has no meaningful order (nested stores)."""
        cached = getattr(self, "_rg_stats", None)
        if cached is not None and cached[0] == (self.version, group_size):
            return cached[1]
        n = self.num_rows
        ngroups = max((n + group_size - 1) // group_size, 1)
        stats = []
        for g in range(ngroups):
            lo, hi = g * group_size, min((g + 1) * group_size, n)
            row = []
            for c in self.columns:
                chunk = c.data[lo:hi]
                nn = c.nulls[lo:hi] if c.nulls is not None else None
                has_nulls = bool(nn.any()) if nn is not None else False
                ordered = c.dtype.is_integer or c.dtype.id in (
                    TypeId.DECIMAL, TypeId.DATE, TypeId.TIME,
                    TypeId.TIMESTAMP, TypeId.TIMESTAMPTZ, TypeId.BOOLEAN,
                    TypeId.FLOAT, TypeId.DOUBLE) \
                    or (c.dtype.id == TypeId.VARCHAR
                        and c.strdict is not None)
                if not ordered:
                    row.append((None, None, has_nulls))
                    continue
                live = chunk if nn is None else chunk[~nn]
                if len(live) == 0:
                    row.append((None, None, has_nulls))
                else:
                    row.append((live.min(), live.max(), has_nulls))
            stats.append(row)
        self._rg_stats = ((self.version, group_size), stats)
        return stats

    def device_batch_groups(self, column_indices, group_ids,
                            group_size: int = ROW_GROUP_SIZE) -> Batch:
        """Batch of only the given row groups' rows (zone-map scan
        skipping).  Host-side slice concatenation feeds the device; the
        result is exact-shape like device_batch."""
        n = self.num_rows
        cols = self.columns if column_indices is None else \
            [self.columns[i] for i in column_indices]
        slices = [(g * group_size, min((g + 1) * group_size, n))
                  for g in group_ids]
        arrays = [np.concatenate([c.data[lo:hi] for lo, hi in slices])
                  if slices else c.data[:0] for c in cols]
        nulls = [np.concatenate([c.nulls[lo:hi] for lo, hi in slices])
                 if (c.nulls is not None and slices)
                 else (None if c.nulls is None else c.nulls[:0])
                 for c in cols]
        nrows = sum(hi - lo for lo, hi in slices)
        return make_batch(arrays, nulls, nrows)


# ---------------------------------------------------------------------------
# ingest helpers
# ---------------------------------------------------------------------------

def from_arrow(name: str, atable) -> TableData:
    """Build a TableData from a pyarrow Table."""
    import pyarrow as pa

    cols = []
    for i, f in enumerate(atable.schema):
        arr = atable.column(i).combine_chunks()
        cols.append(_from_arrow_column(f.name, arr))
    return TableData(name, cols)


def _from_arrow_column(name: str, arr) -> TableColumn:
    import pyarrow as pa
    import pyarrow.compute as pc

    t = arr.type
    nulls = None
    if arr.null_count:
        nulls = np.asarray(pc.is_null(arr)).astype(bool)

    def np_of(a, dtype):
        v = a.to_numpy(zero_copy_only=False)
        v = np.ascontiguousarray(v)
        if nulls is not None:
            v = np.where(nulls, np.zeros((), dtype=dtype), v)
        return v.astype(dtype)

    if pa.types.is_null(t):
        # empty / all-NULL column: default to INTEGER (duckdb uses SQLNULL
        # then casts on use; INTEGER keeps the device path dense)
        n = len(arr)
        return TableColumn(name, T.INTEGER, np.zeros(n, dtype=np.int32),
                           np.ones(n, dtype=bool) if n else None)
    if pa.types.is_boolean(t):
        return TableColumn(name, T.BOOLEAN, np_of(arr, np.bool_), nulls)
    if pa.types.is_integer(t):
        wide = pa.types.is_int64(t) or pa.types.is_uint32(t) \
            or pa.types.is_uint64(t)
        dt = T.BIGINT if wide else T.INTEGER
        return TableColumn(name, dt, np_of(arr, dt.np_dtype), nulls)
    if pa.types.is_floating(t):
        dt = T.DOUBLE if pa.types.is_float64(t) else T.FLOAT
        return TableColumn(name, dt, np_of(arr, dt.np_dtype), nulls)
    if pa.types.is_decimal(t):
        dt = T.DECIMAL(min(t.precision, 18), t.scale)
        # decimal -> scaled int64 via python Decimal (exact)
        py = arr.to_pylist()
        f = 10 ** t.scale
        v = np.array([0 if x is None else int(x.scaleb(t.scale))
                      for x in py], dtype=np.int64)
        return TableColumn(name, dt, v, nulls)
    if pa.types.is_date(t):
        days = arr.cast(pa.date32())
        v = np.asarray(days.to_numpy(zero_copy_only=False))
        v = v.astype("datetime64[D]").astype(np.int64).astype(np.int32) \
            if v.dtype.kind == "M" else v.astype(np.int32)
        if nulls is not None:
            v = np.where(nulls, 0, v)
        return TableColumn(name, T.DATE, v, nulls)
    if pa.types.is_timestamp(t):
        us = arr.cast(pa.timestamp("us"))
        v = us.to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        if nulls is not None:
            v = np.where(nulls, 0, v)
        return TableColumn(name, T.TIMESTAMP, v, nulls)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        py = arr.to_pylist()
        sd, codes, n2 = StringDictionary.encode(py)
        nulls = n2 if n2.any() else None
        return TableColumn(name, T.VARCHAR, codes, nulls, strdict=sd)
    if pa.types.is_dictionary(t):
        return _from_arrow_column(name, arr.cast(pa.string()))
    # nested / var-len payloads: rows carry an int32 store id, payloads
    # stay host-side (see storage/nested.py; reference: nested Vector
    # child vectors, src/common/types/vector.cpp)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        from .lists import ListStore
        py = arr.to_pylist()
        store = ListStore([x if x is not None else [] for x in py])
        ids = np.arange(len(py), dtype=np.int32)
        return TableColumn(name, T.LIST(_arrow_logical_type(t.value_type)),
                           ids, nulls, strdict=store)
    if pa.types.is_struct(t):
        from .nested import StructStore
        fnames = [t.field(i).name for i in range(t.num_fields)]
        py = arr.to_pylist()
        items = [tuple((x or {}).get(fn) for fn in fnames) for x in py]
        store = StructStore(fnames, items)
        st = T.STRUCT((t.field(i).name,
                       _arrow_logical_type(t.field(i).type))
                      for i in range(t.num_fields))
        ids = np.arange(len(py), dtype=np.int32)
        return TableColumn(name, st, ids, nulls, strdict=store)
    if pa.types.is_map(t):
        from .nested import MapStore
        py = arr.to_pylist()
        store = MapStore([list(x) if x is not None else [] for x in py])
        mt = T.MAP(_arrow_logical_type(t.key_type),
                   _arrow_logical_type(t.item_type))
        ids = np.arange(len(py), dtype=np.int32)
        return TableColumn(name, mt, ids, nulls, strdict=store)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) \
            or pa.types.is_fixed_size_binary(t):
        from .nested import BlobStore
        py = arr.to_pylist()
        store = BlobStore([x if x is not None else b"" for x in py])
        ids = np.arange(len(py), dtype=np.int32)
        return TableColumn(name, T.BLOB, ids, nulls, strdict=store)
    raise TypeError(f"unsupported arrow type {t} for column {name}")


def _arrow_logical_type(t) -> DataType:
    """Arrow type -> our logical DataType (element types of nested
    payloads; payload values stay python-side, so this is metadata)."""
    import pyarrow as pa
    if pa.types.is_boolean(t):
        return T.BOOLEAN
    if pa.types.is_integer(t):
        wide = pa.types.is_int64(t) or pa.types.is_uint32(t) \
            or pa.types.is_uint64(t)
        return T.BIGINT if wide else T.INTEGER
    if pa.types.is_floating(t):
        return T.DOUBLE if pa.types.is_float64(t) else T.FLOAT
    if pa.types.is_decimal(t):
        return T.DECIMAL(min(t.precision, 38), t.scale)
    if pa.types.is_date(t):
        return T.DATE
    if pa.types.is_timestamp(t):
        return T.TIMESTAMP
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return T.LIST(_arrow_logical_type(t.value_type))
    if pa.types.is_struct(t):
        return T.STRUCT((t.field(i).name,
                         _arrow_logical_type(t.field(i).type))
                        for i in range(t.num_fields))
    if pa.types.is_map(t):
        return T.MAP(_arrow_logical_type(t.key_type),
                     _arrow_logical_type(t.item_type))
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return T.BLOB
    return T.VARCHAR


def from_pandas(name: str, df) -> TableData:
    import pyarrow as pa
    return from_arrow(name, pa.Table.from_pandas(df, preserve_index=False))


def from_pydict(name: str, data: Dict[str, list],
                types_: Optional[Dict[str, DataType]] = None) -> TableData:
    import pyarrow as pa
    at = pa.table(data)
    td = from_arrow(name, at)
    return td
