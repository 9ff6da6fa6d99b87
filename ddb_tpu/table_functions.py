"""Built-in table functions: introspection + generators.

Analog of the reference's system table functions
(reference: src/function/table/system/* — duckdb_tables, duckdb_columns,
duckdb_settings, ... — and src/function/table/range.cpp).
"""

from __future__ import annotations

from typing import Callable, Dict, List

import numpy as np

from . import types as T
from .storage.strings import StringDictionary
from .storage.table import TableColumn, TableData


def _strcol(name, values) -> TableColumn:
    sd, codes, nulls = StringDictionary.encode([str(v) for v in values])
    return TableColumn(name, T.VARCHAR, codes, None, sd)


def _intcol(name, values) -> TableColumn:
    return TableColumn(name, T.BIGINT, np.asarray(values, dtype=np.int64))


def fn_duckdb_tables(ctx, args) -> TableData:
    names, ncols, nrows = [], [], []
    for name, td in sorted(ctx.catalog.tables.items()):
        names.append(name)
        ncols.append(len(td.columns))
        nrows.append(td.num_rows)
    return TableData("duckdb_tables", [
        _strcol("table_name", names),
        _intcol("column_count", ncols),
        _intcol("estimated_size", nrows)])


def fn_duckdb_columns(ctx, args) -> TableData:
    t, c, i, ty = [], [], [], []
    for name, td in sorted(ctx.catalog.tables.items()):
        for idx, col in enumerate(td.columns):
            t.append(name)
            c.append(col.name)
            i.append(idx)
            ty.append(repr(col.dtype))
    return TableData("duckdb_columns", [
        _strcol("table_name", t), _strcol("column_name", c),
        _intcol("column_index", i), _strcol("data_type", ty)])


def fn_duckdb_settings(ctx, args) -> TableData:
    rows = ctx.config.rows()
    return TableData("duckdb_settings", [
        _strcol("name", [r[0] for r in rows]),
        _strcol("value", [r[1] for r in rows]),
        _strcol("description", [r[2] for r in rows]),
        _strcol("scope", [r[3] for r in rows])])


def fn_duckdb_views(ctx, args) -> TableData:
    names = sorted(ctx.catalog.views)
    sqls = [ctx.catalog.views[n][0] for n in names]
    return TableData("duckdb_views", [
        _strcol("view_name", names), _strcol("sql", sqls)])


def fn_duckdb_snapshots(ctx, args) -> TableData:
    ids = ctx.snapshots.ids()
    return TableData("duckdb_snapshots", [_intcol("snapshot_id", ids)])


def fn_range(ctx, args) -> TableData:
    if len(args) == 1:
        start, stop, step = 0, int(args[0]), 1
    elif len(args) == 2:
        start, stop, step = int(args[0]), int(args[1]), 1
    else:
        start, stop, step = int(args[0]), int(args[1]), int(args[2])
    v = np.arange(start, stop, step, dtype=np.int64)
    return TableData("range", [_intcol("range", v)])


def fn_generate_series(ctx, args) -> TableData:
    if len(args) == 1:
        start, stop, step = 0, int(args[0]), 1
    elif len(args) == 2:
        start, stop, step = int(args[0]), int(args[1]), 1
    else:
        start, stop, step = int(args[0]), int(args[1]), int(args[2])
    v = np.arange(start, stop + (1 if step > 0 else -1), step,
                  dtype=np.int64)
    return TableData("generate_series", [_intcol("generate_series", v)])


def fn_pragma_table_info(ctx, args) -> TableData:
    td = ctx.catalog.get_table(str(args[0]))
    return TableData("pragma_table_info", [
        _intcol("cid", list(range(len(td.columns)))),
        _strcol("name", [c.name for c in td.columns]),
        _strcol("type", [repr(c.dtype) for c in td.columns]),
    ])


def fn_duckdb_logs(ctx, args) -> TableData:
    import datetime
    es = list(ctx.log.entries)
    return TableData("duckdb_logs", [
        _strcol("timestamp", [
            datetime.datetime.fromtimestamp(e.ts).isoformat()
            for e in es]),
        _strcol("level", [e.level for e in es]),
        _strcol("type", [e.type for e in es]),
        _strcol("message", [e.message for e in es])])


TABLE_FUNCTIONS: Dict[str, Callable] = {
    "duckdb_logs": fn_duckdb_logs,
    "duckdb_tables": fn_duckdb_tables,
    "duckdb_columns": fn_duckdb_columns,
    "duckdb_settings": fn_duckdb_settings,
    "duckdb_views": fn_duckdb_views,
    "duckdb_snapshots": fn_duckdb_snapshots,
    "range": fn_range,
    "generate_series": fn_generate_series,
    "pragma_table_info": fn_pragma_table_info,
}
