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
    if name == "tz_shift":
        # piecewise-constant offset lookup over a small bind-time
        # transition table (reference: ICU conversions; ours compile to
        # a compare_all searchsorted over ~a few hundred boundaries)
        import numpy as _np
        d, n = evaluate(e.args[0], batch)
        bounds, delta = e.extra
        idx = jnp.searchsorted(jnp.asarray(bounds), d, side="right",
                               method="compare_all") - 1
        off = jnp.asarray(delta)[jnp.clip(idx, 0, len(delta) - 1)]
        return d + off, n
    if name == "timetz_from_tz":
        # (session wall micros, utc micros) -> packed TIMETZ carrying
        # the session zone's offset at that instant
        w, n1 = evaluate(e.args[0], batch)
        u, n2 = evaluate(e.args[1], batch)
        off = jnp.floor_divide(w - u, 1_000_000)
        tod = jnp.mod(w, 86_400_000_000)
        packed = (tod - off * 1_000_000) * 131072 + (57599 - off)
        n = n1 if n2 is None else (n2 if n1 is None else (n1 | n2))
        return packed, n
    if name == "__stringify__":
        # temporal -> VARCHAR on unbounded columns: host callback
        # formats this batch's values, fills the runtime output
        # dictionary, and returns per-row codes (one call per
        # execution — whole-column batches by design)
        import jax
        import numpy as np
        src_dtype, src_sd, out_sd = e.extra
        d, n = evaluate(e.args[0], batch)
        cap = batch.sel.shape[0]
        null_m = n if n is not None else jnp.zeros(cap, dtype=bool)

        def host(live_m, arr, nl):
            a = np.asarray(arr)
            lv = np.asarray(live_m) & ~np.asarray(nl)
            texts = np.empty(cap, dtype=object)
            texts[:] = ""
            for i in np.nonzero(lv)[0]:
                texts[i] = T.stringify_value(a[i], src_dtype, src_sd)
            uniq = np.unique(texts[lv].astype(str)) if lv.any() \
                else np.array([], dtype=object)
            out_sd.values = uniq.astype(object)
            out_sd._lookup = None
            codes = np.zeros(cap, dtype=np.int32)
            if lv.any():
                codes[lv] = np.searchsorted(
                    uniq, texts[lv].astype(str)).astype(np.int32)
            return codes

        codes = jax.pure_callback(
            host, jax.ShapeDtypeStruct((cap,), np.int32),
            batch.sel, d, null_m)
        return codes, n
    if name == "__pyudf__":
        # user-defined scalar function: host row-wise evaluation through
        # jax.pure_callback so it composes with jitted pipelines
        # (reference: python UDFs, tools/pythonpkg/src/python_udf.cpp)
        import jax
        import numpy as np
        fn, arg_dicts = e.extra[0], e.extra[1]
        pass_nulls = len(e.extra) > 2 and e.extra[2]
        out_sd = e.extra[3] if len(e.extra) > 3 else None
        vals, nulls = [], []
        for a in e.args:
            d, nl = evaluate(a, batch)
            vals.append(d)
            nulls.append(nl)
        cap = batch.sel.shape[0]
        out_np = np.dtype(e.dtype.np_dtype)
        k = len(vals)
        stringify = out_sd is not None
        null_args = [nl if nl is not None
                     else jnp.zeros(cap, dtype=bool) for nl in nulls]

        # only invoke the UDF on rows that are both selected and (unless
        # pass_nulls) have all-non-NULL arguments; a UDF that raises on
        # filtered-out values must not crash the query (reference
        # evaluates only selected rows, python_udf.cpp)
        live = batch.sel
        if not pass_nulls:
            for nl in nulls:
                if nl is not None:
                    live = live & ~nl

        def host(live_m, *arrs):
            live_np = np.asarray(live_m)
            cols = []
            for arr, sd in zip(arrs[:k], arg_dicts):
                a = np.asarray(arr)
                if sd is not None:
                    a = sd.decode(np.clip(a, 0, max(len(sd) - 1, 0))
                                  .astype(np.int64))
                cols.append(a)
            ncols = [np.asarray(x) for x in arrs[k:]]
            outv = np.zeros(cap, dtype=out_np)
            outn = np.zeros(cap, dtype=bool)
            texts = np.empty(cap, dtype=object) if stringify else None
            if stringify:
                texts[:] = ""
            for i, row in enumerate(zip(*cols) if cols
                                    else ((),) * cap):
                if not live_np[i]:
                    outn[i] = True
                    continue
                if pass_nulls:
                    v = fn(row, tuple(nc[i] for nc in ncols))
                else:
                    v = fn(*row)
                if v is None:
                    outn[i] = True
                    if not stringify:
                        outv[i] = out_np.type(0)
                elif stringify:
                    texts[i] = str(v)
                else:
                    outv[i] = v
            if stringify:
                lv = ~outn & live_np
                uniq = np.unique(texts[lv].astype(str)) if lv.any() \
                    else np.array([], dtype=object)
                out_sd.values = uniq.astype(object)
                out_sd._lookup = None
                if lv.any():
                    outv[lv] = np.searchsorted(
                        uniq, texts[lv].astype(str)).astype(out_np)
            return outv, outn

        out, udf_null = jax.pure_callback(
            host, (jax.ShapeDtypeStruct((cap,), out_np),
                   jax.ShapeDtypeStruct((cap,), np.bool_)),
            live, *vals, *(null_args if pass_nulls else ()))
        n = udf_null
        if not pass_nulls:
            for nl in nulls:
                if nl is not None:
                    n = n | nl
        return out, n
    if name == "floordiv_pow52":
        d, n = evaluate(e.args[0], batch)
        return jnp.floor_divide(d.astype(jnp.int64),
                                jnp.int64(1) << 52), n
    if name == "bit_count":
        # popcount via SWAR (reference: bit_count on integers) of the
        # two's-complement pattern at the DECLARED width (narrow ints
        # ride wider lanes here; the reference's overloads are per-type)
        d, n = evaluate(e.args[0], batch)
        w = {T.TypeId.TINYINT: 8, T.TypeId.SMALLINT: 16,
             T.TypeId.INTEGER: 32}.get(e.args[0].dtype.id, 64)
        v = d.astype(jnp.uint64)
        if w < 64:
            v = v & jnp.uint64((1 << w) - 1)
        v = v - ((v >> 1) & jnp.uint64(0x5555555555555555))
        v = (v & jnp.uint64(0x3333333333333333)) \
            + ((v >> 2) & jnp.uint64(0x3333333333333333))
        v = (v + (v >> 4)) & jnp.uint64(0x0F0F0F0F0F0F0F0F)
        out = (v * jnp.uint64(0x0101010101010101)) >> 56
        return out.astype(jnp.int64), n
    if name == "months_between_us":
        # whole calendar months from b (arg1) to a (arg0), both
        # timestamp micros: months then clamped so b + months <= a
        # (reference: Interval::GetAge, src/common/types/interval.cpp)
        a_us, n1 = evaluate(e.args[0], batch)
        b_us, n2 = evaluate(e.args[1], batch)
        us_day = 86_400_000_000
        ad = jnp.floor_divide(a_us, us_day)
        bd = jnp.floor_divide(b_us, us_day)
        ay, am, _dd = _civil_from_days(ad)
        by, bm, _d2 = _civil_from_days(bd)
        months0 = (ay.astype(jnp.int64) - by) * 12 + (am - bm)

        def anchor_of(months):
            t = by.astype(jnp.int64) * 12 + (bm - 1) + months
            y2 = jnp.floor_divide(t, 12)
            m2 = t - y2 * 12 + 1
            ny = jnp.where(m2 == 12, y2 + 1, y2)
            nm = jnp.where(m2 == 12, jnp.ones_like(m2), m2 + 1)
            first = _days_from_civil_dev(y2, m2, jnp.ones_like(m2))
            first_next = _days_from_civil_dev(ny, nm,
                                              jnp.ones_like(nm))
            bdd = bd - _days_from_civil_dev(by, bm,
                                            jnp.ones_like(bm)) + 1
            dd2 = jnp.minimum(bdd, first_next - first)
            nd = _days_from_civil_dev(y2, m2, dd2)
            return nd * us_day + (b_us - bd * us_day)

        sign = jnp.where(a_us >= b_us, 1, -1)
        # clamp: step months toward b while the anchor overshoots a
        months = months0
        for _ in range(2):
            over = jnp.where(sign > 0, anchor_of(months) > a_us,
                             anchor_of(months) < a_us)
            months = months - jnp.where(over, sign, 0)
        n = n1 if n2 is None else (n2 if n1 is None else (n1 | n2))
        return months.astype(jnp.int64), n
    if name == "add_months_dyn_us":
        # timestamp micros + per-row month count (runtime months)
        ts, n1 = evaluate(e.args[0], batch)
        months, n2 = evaluate(e.args[1], batch)
        us_day = 86_400_000_000
        days = jnp.floor_divide(ts, us_day)
        tod = ts - days * us_day
        y, m, dd = _civil_from_days(days)
        t = y.astype(jnp.int64) * 12 + (m - 1) + months
        y2 = jnp.floor_divide(t, 12)
        m2 = t - y2 * 12 + 1
        ny = jnp.where(m2 == 12, y2 + 1, y2)
        nm = jnp.where(m2 == 12, jnp.ones_like(m2), m2 + 1)
        first = _days_from_civil_dev(y2, m2, jnp.ones_like(m2))
        first_next = _days_from_civil_dev(ny, nm, jnp.ones_like(nm))
        dd2 = jnp.minimum(dd.astype(jnp.int64), first_next - first)
        nd = _days_from_civil_dev(y2, m2, dd2)
        n = n1 if n2 is None else (n2 if n1 is None else (n1 | n2))
        return nd * us_day + tod, n
    if name in ("year", "month", "day"):
        d, n = evaluate(e.args[0], batch)
        y, m, dd = _civil_from_days(d)
        out = {"year": y, "month": m, "day": dd}[name]
        return out.astype(jnp.int64), n
    if name in ("add_months_days", "add_months_us"):
        # calendar month addition with end-of-month clamping
        # (reference: Interval::Add, src/common/types/interval.cpp +
        # date.cpp AddMonths; device-side civil-date math, no callback)
        d, n = evaluate(e.args[0], batch)
        months = int(e.extra)
        us_day = 86_400_000_000
        if name == "add_months_us":
            days = jnp.floor_divide(d, us_day)
            tod = d - days * us_day
        else:
            days = d
        y, m, dd = _civil_from_days(days)
        t = y * 12 + (m - 1) + months
        y2 = jnp.floor_divide(t, 12)
        m2 = t - y2 * 12 + 1
        ny = jnp.where(m2 == 12, y2 + 1, y2)
        nm = jnp.where(m2 == 12, jnp.ones_like(m2), m2 + 1)
        first = _days_from_civil_dev(y2, m2, jnp.ones_like(m2))
        first_next = _days_from_civil_dev(ny, nm, jnp.ones_like(nm))
        dd2 = jnp.minimum(dd, first_next - first)
        nd = _days_from_civil_dev(y2, m2, dd2)
        if name == "add_months_us":
            return nd.astype(jnp.int64) * us_day + tod, n
        return nd.astype(jnp.int32), n
    if name == "abs":
        d, n = evaluate(e.args[0], batch)
        return jnp.abs(d), n
    if name == "rowid":
        import jax.lax as _lax
        cap = batch.sel.shape[0]
        return _lax.broadcasted_iota(jnp.int64, (cap,), 0), None
    if name == "random":
        import jax
        cap = batch.sel.shape[0]
        with jax.ensure_compile_time_eval():
            key = jax.random.PRNGKey(int(e.extra or 0) & 0x7FFFFFFF)
        return jax.random.uniform(key, (cap,), dtype=jnp.float64), None
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
    if name in _MATH1:
        d, n = evaluate(e.args[0], batch)
        return _MATH1[name](d.astype(jnp.float64)), n
    if name in _BOOL_MATH1:
        d, n = evaluate(e.args[0], batch)
        return _BOOL_MATH1[name](d.astype(jnp.float64)), n
    if name in ("atan2", "nextafter"):
        a, an = evaluate(e.args[0], batch)
        b2, bn = evaluate(e.args[1], batch)
        n = an if bn is None else (bn if an is None else an | bn)
        fn = jnp.arctan2 if name == "atan2" else jnp.nextafter
        return fn(a.astype(jnp.float64), b2.astype(jnp.float64)), n
    if name in ("gcd", "lcm"):
        a, an = evaluate(e.args[0], batch)
        b2, bn = evaluate(e.args[1], batch)
        n = an if bn is None else (bn if an is None else an | bn)
        aa = jnp.abs(a.astype(jnp.int64))
        bb = jnp.abs(b2.astype(jnp.int64))
        g = jnp.gcd(aa, bb)
        if name == "gcd":
            return g, n
        return jnp.where(g == 0, 0, aa // jnp.maximum(g, 1) * bb), n
    if name == "factorial":
        import math as _math
        d, n = evaluate(e.args[0], batch)
        table = jnp.asarray([_math.factorial(i) for i in range(21)],
                            dtype=jnp.int64)
        idx = jnp.clip(d.astype(jnp.int32), 0, 20)
        return jnp.take(table, idx), n
    if name == "even":
        # round to the next even number away from zero
        d, n = evaluate(e.args[0], batch)
        x = d.astype(jnp.float64)
        return jnp.sign(x) * jnp.ceil(jnp.abs(x) / 2.0) * 2.0, n
    if name == "to_timestamp":
        # seconds (double) since epoch -> TIMESTAMP micros
        d, n = evaluate(e.args[0], batch)
        return jnp.floor(d.astype(jnp.float64) * 1e6).astype(jnp.int64), n
    if name == "make_date":
        y, yn = evaluate(e.args[0], batch)
        m, mn = evaluate(e.args[1], batch)
        d, dn = evaluate(e.args[2], batch)
        n = None
        for x in (yn, mn, dn):
            if x is not None:
                n = x if n is None else (n | x)
        return _days_from_civil_dev(y, m, d).astype(jnp.int32), n
    if name == "make_time":
        h, hn = evaluate(e.args[0], batch)
        m, mn = evaluate(e.args[1], batch)
        s, sn = evaluate(e.args[2], batch)
        n = None
        for x in (hn, mn, sn):
            if x is not None:
                n = x if n is None else (n | x)
        us = (h.astype(jnp.int64) * 3600 + m.astype(jnp.int64) * 60) \
            * 1_000_000 + jnp.floor(
                s.astype(jnp.float64) * 1e6).astype(jnp.int64)
        return us, n
    if name == "make_timestamp":
        if len(e.args) == 1:
            return evaluate(e.args[0], batch)   # micros passthrough
        vals, n = [], None
        for a in e.args:
            v, vn = evaluate(a, batch)
            vals.append(v)
            if vn is not None:
                n = vn if n is None else (n | vn)
        y, m, d, h, mi, s = vals
        days = _days_from_civil_dev(y, m, d)
        us = days * 86_400_000_000 \
            + (h.astype(jnp.int64) * 3600 + mi.astype(jnp.int64) * 60) \
            * 1_000_000 \
            + jnp.floor(s.astype(jnp.float64) * 1e6).astype(jnp.int64)
        return us, n
    if name == "time_bucket":
        # time_bucket(width_us, ts[, origin]): floor to width boundary
        d, n = evaluate(e.args[0], batch)
        width, origin = e.extra
        dd = d.astype(jnp.int64) - origin
        return (dd - (dd % width)) + origin, n
    if name in ("pow", "power"):
        a, an = evaluate(e.args[0], batch)
        b, bn = evaluate(e.args[1], batch)
        n = an if bn is None else (bn if an is None else an | bn)
        return jnp.power(a.astype(jnp.float64),
                         b.astype(jnp.float64)), n
    if name in ("least", "greatest"):
        fn = jnp.minimum if name == "least" else jnp.maximum
        out_d, out_n = evaluate(e.args[0], batch)
        for a in e.args[1:]:
            d, n = evaluate(a, batch)
            # NULLs are ignored (SQL least/greatest semantics)
            if out_n is not None and n is not None:
                both = out_n & n
                out_d = jnp.where(out_n, d, jnp.where(n, out_d,
                                                      fn(out_d, d)))
                out_n = both
            elif out_n is not None:
                out_d = jnp.where(out_n, d, fn(out_d, d))
                out_n = None
            elif n is not None:
                out_d = jnp.where(n, out_d, fn(out_d, d))
            else:
                out_d = fn(out_d, d)
        return out_d, out_n
    if name == "nullif":
        a, an = evaluate(e.args[0], batch)
        b, bn = evaluate(e.args[1], batch)
        eq = a == b
        if bn is not None:
            eq = eq & ~bn
        n = eq if an is None else (an | eq)
        return a, n
    if name == "ifnull":
        a, an = evaluate(e.args[0], batch)
        b, bn = evaluate(e.args[1], batch)
        if an is None:
            return a, None
        return jnp.where(an, b, a), (an & bn) if bn is not None else None
    if name in ("date_trunc_year", "date_trunc_month"):
        d, n = evaluate(e.args[0], batch)
        y, m, _ = _civil_from_days(d)
        if name == "date_trunc_year":
            m = jnp.ones_like(m)
        import jax
        days = _days_from_civil_dev(y, m, jnp.ones_like(m))
        return days.astype(jnp.int32), n
    if name == "date_trunc_week":
        # ISO week starts Monday; 1970-01-01 was a Thursday
        d, n = evaluate(e.args[0], batch)
        dd = d.astype(jnp.int64)
        return (dd - ((dd + 3) % 7)).astype(d.dtype), n
    if name == "ts_date":
        # TIMESTAMP (micros) -> DATE (days), floor division
        d, n = evaluate(e.args[0], batch)
        return jnp.floor_divide(d.astype(jnp.int64),
                                86_400_000_000).astype(jnp.int32), n
    if name == "ts_trunc":
        # truncate TIMESTAMP micros to the granularity in e.extra
        d, n = evaluate(e.args[0], batch)
        us = jnp.int64(e.extra)
        dd = d.astype(jnp.int64)
        return dd - (dd % us), n
    if name in ("ts_minute", "ts_hour", "ts_second", "ts_millisecond",
                "ts_microsecond"):
        d, n = evaluate(e.args[0], batch)
        dd = d.astype(jnp.int64)
        us_in_day = dd % 86_400_000_000
        if name == "ts_hour":
            return us_in_day // 3_600_000_000, n
        if name == "ts_minute":
            return (us_in_day // 60_000_000) % 60, n
        if name == "ts_second":
            return (us_in_day // 1_000_000) % 60, n
        if name == "ts_millisecond":
            # duckdb: seconds+ms field, i.e. ms within the minute
            return (us_in_day % 60_000_000) // 1_000, n
        return us_in_day % 60_000_000, n
    if name in ("dayofweek", "isodow"):
        d, n = evaluate(e.args[0], batch)
        # 1970-01-01 was a Thursday (dow 4 with Sunday=0)
        dow = (d.astype(jnp.int64) + 4) % 7
        if name == "isodow":
            dow = jnp.where(dow == 0, 7, dow)
        return dow, n
    if name in ("quarter",):
        d, n = evaluate(e.args[0], batch)
        _, m, _ = _civil_from_days(d)
        return ((m - 1) // 3 + 1).astype(jnp.int64), n
    if name == "dayofyear":
        d, n = evaluate(e.args[0], batch)
        y, _, _ = _civil_from_days(d)
        jan1 = _days_from_civil_dev(y, jnp.ones_like(y), jnp.ones_like(y))
        return (d.astype(jnp.int64) - jan1 + 1), n
    if name in ("week", "isoyear"):
        # ISO week/year via the Thursday of the date's ISO week
        d, n = evaluate(e.args[0], batch)
        d64 = d.astype(jnp.int64)
        dow = (d64 + 4) % 7                      # Sunday=0
        isodow = jnp.where(dow == 0, 7, dow)
        th = d64 - (isodow - 1) + 3
        ty, _, _ = _civil_from_days(th.astype(jnp.int32))
        jan1 = _days_from_civil_dev(ty, jnp.ones_like(ty),
                                    jnp.ones_like(ty))
        if name == "isoyear":
            return ty.astype(jnp.int64), n
        return ((th - jan1) // 7 + 1), n
    if name == "yearweek":
        d, n = evaluate(e.args[0], batch)
        d64 = d.astype(jnp.int64)
        dow = (d64 + 4) % 7
        isodow = jnp.where(dow == 0, 7, dow)
        th = d64 - (isodow - 1) + 3
        ty, _, _ = _civil_from_days(th.astype(jnp.int32))
        jan1 = _days_from_civil_dev(ty, jnp.ones_like(ty),
                                    jnp.ones_like(ty))
        return ty.astype(jnp.int64) * 100 + ((th - jan1) // 7 + 1), n
    if name == "last_day":
        d, n = evaluate(e.args[0], batch)
        y, m, _ = _civil_from_days(d)
        ny = jnp.where(m == 12, y + 1, y)
        nm = jnp.where(m == 12, 1, m + 1)
        first_next = _days_from_civil_dev(ny, nm, jnp.ones_like(nm))
        return (first_next - 1).astype(jnp.int32), n
    if name in ("century", "decade", "millennium"):
        d, n = evaluate(e.args[0], batch)
        y, _, _ = _civil_from_days(d)
        y = y.astype(jnp.int64)
        if name == "decade":
            return y // 10, n
        if name == "century":
            return (y + 99) // 100, n
        return (y + 999) // 1000, n
    if name == "epoch_raw":
        # exact integer micros/millis/nanos since epoch (reference:
        # epoch_us/epoch_ns/epoch_ms scalar functions)
        d, n = evaluate(e.args[0], batch)
        src = e.args[0].dtype
        v = d.astype(jnp.int64)
        if src.id == T.TypeId.DATE:
            us = v * 86_400_000_000
        else:
            us = v            # TIMESTAMP/TIME/INTERVAL already micros
        kind = e.extra
        if kind == "epoch_ms":
            return us // 1000, n
        if kind == "epoch_ns":
            return us * 1000, n
        return us, n
    if name in ("epoch", "epoch_ms"):
        d, n = evaluate(e.args[0], batch)
        src = e.args[0].dtype
        v = d.astype(jnp.int64)
        if src.id == T.TypeId.DATE:
            secs = v * 86400
        elif src.id == T.TypeId.TIMESTAMP:
            secs = v // 1_000_000
        else:
            secs = v
        return (secs * 1000 if name == "epoch_ms" else secs), n
    raise NotImplementedError(f"scalar function {name}")


def _days_from_civil_dev(y, m, d):
    """Device version of days_from_civil (jnp)."""
    y = y.astype(jnp.int64)
    m = m.astype(jnp.int64)
    d = d.astype(jnp.int64)
    y = y - (m <= 2)
    era = jnp.where(y >= 0, y, y - 399) // 400
    yoe = y - era * 400
    doy = (153 * jnp.where(m > 2, m - 3, m + 9) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _gamma_fn(x):
    from jax.scipy import special as jsp
    if hasattr(jsp, "gamma"):
        return jsp.gamma(x)
    return jnp.exp(jsp.gammaln(x))


_MATH1 = {
    "ln": jnp.log, "log": jnp.log10, "log2": jnp.log2, "log10": jnp.log10,
    "exp": jnp.exp, "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan,
    "asin": jnp.arcsin, "acos": jnp.arccos, "atan": jnp.arctan,
    "sinh": jnp.sinh, "cosh": jnp.cosh, "tanh": jnp.tanh,
    "sign": jnp.sign, "radians": jnp.radians, "degrees": jnp.degrees,
    "cbrt": jnp.cbrt,
    # round-4 additions (reference: core_functions/scalar/math)
    "acosh": jnp.arccosh, "asinh": jnp.arcsinh, "atanh": jnp.arctanh,
    "cot": lambda x: 1.0 / jnp.tan(x),
    "gamma": _gamma_fn,
    "lgamma": lambda x: __import__(
        "jax.scipy.special", fromlist=["gammaln"]).gammaln(x),
    "trunc": jnp.trunc,
}

_BOOL_MATH1 = {
    "isnan": jnp.isnan, "isinf": jnp.isinf,
    "isfinite": jnp.isfinite, "signbit": jnp.signbit,
}
