"""Local replica of the driver's Spark-vs-DuckDB correctness comparison.

Stricter than the driver: exact multiset equality of canonicalized cell
values, matching column names, matching row counts. If this passes, the
driver's order-insensitive value hash passes.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonical shortest repr; 1e-9-scale fp noise would show up here —
        # queries are designed to be exactly deterministic instead.
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return repr(round(float(v), 9))
    if isinstance(v, _dt.datetime):
        v = v.replace(tzinfo=None)
        # DuckDB DATE arrives via pandas as midnight datetime64 while Spark
        # DateType arrives as datetime.date — canonicalize midnight to date.
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (int, str)):
        return repr(v)
    return repr(v)


def rows_to_multiset(columns, rows):
    """Sort columns by name, canonicalize cells, return sorted row tuples."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare_spark_duckdb(spark_df, duck_con, sql, name=""):
    sdf = spark_df.toPandas()
    ddf = duck_con.sql(sql).df()
    s_cols = sorted(sdf.columns)
    d_cols = sorted(ddf.columns)
    assert s_cols == d_cols, f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    s_rows = rows_to_multiset(list(sdf.columns), sdf.itertuples(index=False, name=None))
    d_rows = rows_to_multiset(list(ddf.columns), ddf.itertuples(index=False, name=None))
    assert len(s_rows) == len(d_rows), f"{name}: rowcount spark={len(s_rows)} duck={len(d_rows)}"
    if s_rows != d_rows:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
    return len(s_rows)
