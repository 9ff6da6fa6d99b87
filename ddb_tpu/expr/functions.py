"""Scalar function kernels (registry analog of the reference's
src/function/scalar/* and extension/core_functions/scalar/*).

All date math is branch-free integer arithmetic on days-since-epoch
(civil-calendar algorithms), so EXTRACT/date_part fuse into surrounding
expressions on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import types as T
from . import ir


def _civil_from_days(z):
    """days since 1970-01-01 -> (year, month, day); vectorized int32 math."""
    z = z.astype(jnp.int64) + 719468
    era = jnp.where(z >= 0, z, z - 146096) // 146097
    doe = z - era * 146097                                    # [0, 146096]
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)           # [0, 365]
    mp = (5 * doy + 2) // 153                                 # [0, 11]
    d = doy - (153 * mp + 2) // 5 + 1                         # [1, 31]
    m = jnp.where(mp < 10, mp + 3, mp - 9)                    # [1, 12]
    y = jnp.where(m <= 2, y + 1, y)
    return y.astype(jnp.int32), m.astype(jnp.int32), d.astype(jnp.int32)


def days_from_civil(y, m, d):
    """(y, m, d) -> days since 1970-01-01 (host or device)."""
    y = np.asarray(y, dtype=np.int64)
    m = np.asarray(m, dtype=np.int64)
    d = np.asarray(d, dtype=np.int64)
    y = y - (m <= 2)
    era = np.where(y >= 0, y, y - 399) // 400
    yoe = y - era * 400
    doy = (153 * (np.where(m > 2, m - 3, m + 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def add_months_host(days: int, months: int) -> int:
    """Host-side date + INTERVAL n MONTH (duckdb clamps day-of-month)."""
    import datetime
    base = datetime.date(1970, 1, 1) + datetime.timedelta(days=int(days))
    y = base.year + (base.month - 1 + months) // 12
    m = (base.month - 1 + months) % 12 + 1
    # clamp day to end of month
    for dd in (base.day, 30, 29, 28):
        try:
            nd = datetime.date(y, m, dd)
            break
        except ValueError:
            continue
    return (nd - datetime.date(1970, 1, 1)).days


def dispatch(e: ir.Func, batch, evaluate):
    name = e.name
    if name in ("year", "month", "day"):
        d, n = evaluate(e.args[0], batch)
        y, m, dd = _civil_from_days(d)
        out = {"year": y, "month": m, "day": dd}[name]
        return out.astype(jnp.int64), n
    if name == "abs":
        d, n = evaluate(e.args[0], batch)
        return jnp.abs(d), n
    if name == "round":
        d, n = evaluate(e.args[0], batch)
        digits = e.extra or 0
        src = e.args[0].dtype
        if src.id == T.TypeId.DECIMAL:
            # handled at bind time as decimal cast; here: identity
            return d, n
        f = 10.0 ** digits
        return jnp.rint(d * f) / f, n
    if name == "floor":
        d, n = evaluate(e.args[0], batch)
        return jnp.floor(d), n
    if name == "ceil":
        d, n = evaluate(e.args[0], batch)
        return jnp.ceil(d), n
    if name == "sqrt":
        d, n = evaluate(e.args[0], batch)
        return jnp.sqrt(d.astype(jnp.float64)), n
    if name == "coalesce":
        out_d, out_n = evaluate(e.args[0], batch)
        for a in e.args[1:]:
            d, n = evaluate(a, batch)
            if out_n is None:
                break
            out_d = jnp.where(out_n, d, out_d)
            out_n = (out_n & n) if n is not None else None
        return out_d, out_n
    raise NotImplementedError(f"scalar function {name}")
