"""Column-expression helpers shared by operators.

These are Catalyst expressions (JVM-side, whole-stage-codegen'd), not
Python UDFs — the hot path never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY_DP = 2  # decimal places for monetary aggregates (oracle parity)
RATIO_DP = 6  # decimal places for ratios/averages (oracle parity)


def period_month(ts: Column) -> Column:
    """'YYYY-MM' period label, the reference's canonical monthly key.

    Reference: reports/builders/bdqueimadas_incremental.py builds
    ``period`` strings the same way from the detection timestamp.
    """
    return F.date_format(ts, "yyyy-MM")


def period_year(ts: Column) -> Column:
    return F.year(ts)


def safe_pct_change(current: Column, previous: Column) -> Column:
    """Percent change; null when the base is 0/null.

    Reference: reports/builders/bdqueimadas_overview.py:1334-1338
    (``_safe_pct_change``) — returns None on zero base.
    """
    return F.round(
        F.when(
            previous.isNotNull() & (previous != 0),
            (current - previous) / previous * 100.0,
        ),
        RATIO_DP,
    )


def money(col: Column) -> Column:
    """Round a monetary aggregate to absorb summation-order ulp drift
    between engines (Spark vs DuckDB oracle)."""
    return F.round(col, MONEY_DP)


def ratio(col: Column) -> Column:
    return F.round(col, RATIO_DP)
