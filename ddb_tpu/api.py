"""Client API: Connection / QueryResult.

Analog of the reference's Connection/MaterializedQueryResult
(reference: src/include/duckdb/main/connection.hpp:40,
src/main/query_result.cpp), plus pandas/arrow ingest in the spirit of the
reference Python client (tools/pythonpkg/).
"""

from __future__ import annotations

import decimal
from typing import Any, Dict, List, Optional

import numpy as np

from . import types as T
from .batch import Batch, Schema
from .catalog import Catalog
from .plan import logical as L
from .plan import physical
from .storage import table as storage
from .types import TypeId


class QueryResult:
    def __init__(self, schema: Schema, batch: Batch):
        self.schema = schema
        self.batch = batch
        self._rows = None

    @property
    def column_names(self) -> List[str]:
        return self.schema.names

    @property
    def column_types(self):
        return self.schema.types

    # ---- materialization -------------------------------------------------
    def _host_columns(self):
        sel = np.asarray(self.batch.sel)
        cols = []
        for f, c in zip(self.schema.fields, self.batch.columns):
            d = np.asarray(c.data)[sel]
            n = np.asarray(c.nulls)[sel] if c.nulls is not None else None
            cols.append((f, d, n))
        return cols

    def fetchall(self) -> List[tuple]:
        if self._rows is None:
            cols = self._host_columns()
            ncols = []
            for f, d, n in cols:
                vals = _decode_column(f, d, n)
                ncols.append(vals)
            self._rows = list(zip(*ncols)) if ncols else []
        return self._rows

    def fetchone(self):
        rows = self.fetchall()
        return rows[0] if rows else None

    def df(self):
        import pandas as pd
        rows = self.fetchall()
        return pd.DataFrame(rows, columns=self.column_names)

    def arrow(self):
        import pyarrow as pa
        rows = self.fetchall()
        cols = list(zip(*rows)) if rows else [[] for _ in self.schema.fields]
        return pa.table({n: list(c) for n, c
                         in zip(self.column_names, cols)})

    def __repr__(self):
        rows = self.fetchall()
        head = " | ".join(self.column_names)
        lines = [head, "-" * len(head)]
        for r in rows[:20]:
            lines.append(" | ".join(str(v) for v in r))
        if len(rows) > 20:
            lines.append(f"... ({len(rows)} rows)")
        return "\n".join(lines)


def _decode_column(f, d, n):
    t = f.dtype
    out = []
    if t.id == TypeId.DECIMAL:
        q = decimal.Decimal(1).scaleb(-t.scale)
        for i, v in enumerate(d):
            out.append(None if (n is not None and n[i])
                       else decimal.Decimal(int(v)).scaleb(-t.scale)
                       .quantize(q))
        return out
    for i, v in enumerate(d):
        if n is not None and n[i]:
            out.append(None)
        else:
            out.append(T.decode_value(v, t, f.strdict))
    return out


class Connection:
    def __init__(self):
        self.catalog = Catalog()
        self._plan_cache: Dict[str, Any] = {}

    # ---- ingest ----------------------------------------------------------
    def register(self, name: str, obj) -> "Connection":
        """Register a pandas DataFrame / pyarrow Table / dict of columns."""
        import pyarrow as pa
        if isinstance(obj, pa.Table):
            td = storage.from_arrow(name, obj)
        elif isinstance(obj, dict):
            td = storage.from_pydict(name, obj)
        else:
            td = storage.from_pandas(name, obj)
        self.catalog.add_table(td, or_replace=True)
        return self

    def read_parquet(self, name: str, path: str) -> "Connection":
        import pyarrow.parquet as pq
        self.catalog.add_table(
            storage.from_arrow(name, pq.read_table(path)), or_replace=True)
        return self

    def read_csv(self, name: str, path: str, **kw) -> "Connection":
        import pyarrow.csv as pcsv
        opts = {}
        if "delimiter" in kw:
            opts["parse_options"] = pcsv.ParseOptions(
                delimiter=kw["delimiter"])
        if "column_names" in kw:
            opts["read_options"] = pcsv.ReadOptions(
                column_names=kw["column_names"])
        self.catalog.add_table(
            storage.from_arrow(name, pcsv.read_csv(path, **opts)),
            or_replace=True)
        return self

    # ---- query -----------------------------------------------------------
    def execute(self, sql: str) -> QueryResult:
        from .sql import parser as sqlparser
        from .sql.binder import Binder
        stmts = sqlparser.parse(sql)
        result = None
        for stmt in stmts:
            result = self._execute_statement(stmt)
        return result

    sql = execute
    query = execute

    def _execute_statement(self, stmt) -> Optional[QueryResult]:
        from .sql import ast as A
        from .sql.binder import Binder
        if isinstance(stmt, A.SelectStmt):
            binder = Binder(self.catalog)
            plan = binder.bind_select(stmt)
            plan = self._optimize(plan)
            schema, batch = physical.execute(plan)
            return QueryResult(schema, batch)
        if isinstance(stmt, A.CreateView):
            self.catalog.add_view(stmt.name, stmt.sql_text,
                                  or_replace=stmt.or_replace)
            return None
        if isinstance(stmt, A.DropStmt):
            if stmt.kind == "view":
                self.catalog.drop_view(stmt.name, if_exists=stmt.if_exists)
            else:
                self.catalog.drop_table(stmt.name, if_exists=stmt.if_exists)
            return None
        if isinstance(stmt, A.CreateTableAs):
            binder = Binder(self.catalog)
            plan = binder.bind_select(stmt.select)
            plan = self._optimize(plan)
            schema, batch = physical.execute(plan)
            td = _result_to_table(stmt.name, schema, batch)
            self.catalog.add_table(td, or_replace=stmt.or_replace)
            return None
        raise NotImplementedError(f"statement {type(stmt).__name__}")

    def _optimize(self, plan):
        from .plan import optimizer
        return optimizer.optimize(plan)

    def execute_plan(self, plan: L.LogicalNode) -> QueryResult:
        """Execute a hand-built bound logical plan (testing / internal)."""
        schema, batch = physical.execute(plan)
        return QueryResult(schema, batch)

    def table(self, name: str) -> storage.TableData:
        return self.catalog.get_table(name)


def _result_to_table(name, schema: Schema, batch: Batch):
    sel = np.asarray(batch.sel)
    cols = []
    for f, c in zip(schema.fields, batch.columns):
        d = np.asarray(c.data)[sel]
        n = np.asarray(c.nulls)[sel] if c.nulls is not None else None
        cols.append(storage.TableColumn(f.name, f.dtype, d, n,
                                        strdict=f.strdict))
    return storage.TableData(name, cols)


def connect() -> Connection:
    return Connection()
