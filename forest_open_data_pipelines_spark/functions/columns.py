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


def parse_pt_numeric(text: Column) -> Column:
    """Locale-tolerant numeric parse: strings containing a comma are
    read as pt-BR ('1.234,56' — dots are thousand separators, comma is
    the decimal mark); otherwise as plain en numerics. Unparseable
    input yields null, never an error.

    Reference: social/anp_producao/pipeline.py:241-246
    (``_parse_numeric``) — the comma test decides per value, not per
    column, because ANP files mix both renderings.
    """
    trimmed = F.trim(text)
    normalized = F.when(
        trimmed.contains(","),
        F.replace(F.replace(trimmed, F.lit("."), F.lit("")), F.lit(","), F.lit(".")),
    ).otherwise(trimmed)
    return normalized.try_cast("double")
