"""Driver-shaped frame canonicalization, single-sourced.

The driver's t2 correctness gate compares PANDAS frames from both
engines (Spark ``toPandas()`` vs DuckDB ``.df()``), sorted by column
name then by row, stringified cell-by-cell. Both local harnesses —
``tests/test_oracle_parity.py`` and ``tools/check_correctness.py`` —
import this module so they share the exact compare, dtype sensitivity
included (an int64 2356 vs a float64 2356.0, e.g. duckdb sum(BIGINT) →
HUGEINT → float64, must fail here the way it fails there; fetchall()
masked exactly that in round 10).
"""

from __future__ import annotations

import math
from datetime import date, datetime


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, float):
        # pandas surfaces SQL NULL as NaN (e.g. a nullable BOOLEAN from
        # duckdb .df()), so NaN and None must canonicalize identically
        return "NULL" if math.isnan(v) else repr(round(v, 9))
    if isinstance(v, datetime):
        v = v.replace(tzinfo=None)
        # duckdb returns DATE columns as midnight datetime64 where
        # spark returns datetime.date — the driver compares them equal
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def pandas_signature(df):
    """pandas frame → (sorted column names, sorted stringified rows).

    SORT ROWS on the raw frame (list/dict cells are unhashable and must
    blow up here exactly like the driver's sort_values does), then
    stringify cell-by-cell.
    """
    import pandas as pd

    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort")
    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is pd.NaT:
                v = None
            elif isinstance(v, pd.Timestamp):
                v = v.to_pydatetime()
            elif hasattr(v, "item") and not isinstance(v, (bytes, str)):
                v = v.item()
            vals.append(canon(v))
        out.append(tuple(vals))
    return cols, out
