"""Portuguese date parsing as pure Catalyst expressions.

Twin of the reference's news-date handling
(``datasets/noticias_agricolas/dates.py:1-57`` — ``parse_published_line``
for 'Publicado em DD/MM/YYYY HH:MM', ``combine_listing_datetime`` for
the listing-page date+time fallback, ``to_iso8601_z`` for the
America/Sao_Paulo → UTC ISO form) plus long-form PT dates
('12 de março de 2024', month labels per
``social/bdqueimadas_monthly_chart.py`` MONTH_LABELS_PT extended to
full names).

All parsing is regexp_extract + try_make_timestamp — JVM expressions
that fuse into the scan; malformed input yields NULL (the reference
returns None), never an exception, so one bad row can't kill a 100 TB
ingest job.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TZ_BR = "America/Sao_Paulo"

# Full lowercase month names (the chart module's labels are the
# 3-letter prefixes of these).
PT_MONTH_NAMES = (
    "janeiro", "fevereiro", "março", "abril", "maio", "junho",
    "julho", "agosto", "setembro", "outubro", "novembro", "dezembro",
)

_PUBLISHED_RE = r"(?i)publicado\s+em\s+(\d{1,2})/(\d{1,2})/(\d{4})\s+(\d{1,2}):(\d{2})"
_LONG_RE = r"(?i)(\d{1,2})\s+de\s+([a-zA-Zç]+)\s+de\s+(\d{4})"


def _int_group(col: Column, pattern: str, group: int) -> Column:
    return F.nullif(F.regexp_extract(col, pattern, group), F.lit("")).cast("int")


def parse_published_line(datas: Column) -> Column:
    """'Publicado em DD/MM/YYYY HH:MM' → naive timestamp (dates.py:16-28);
    no match or impossible date (31/02) → NULL."""
    return F.try_make_timestamp(
        _int_group(datas, _PUBLISHED_RE, 3),
        _int_group(datas, _PUBLISHED_RE, 2),
        _int_group(datas, _PUBLISHED_RE, 1),
        _int_group(datas, _PUBLISHED_RE, 4),
        _int_group(datas, _PUBLISHED_RE, 5),
        F.lit(0),
    )


def combine_listing_datetime(date_ddmmyyyy: Column, time_hhmm: Column) -> Column:
    """Listing h3 date + span.hora time → naive timestamp
    (dates.py:31-49); either part malformed → NULL."""
    d_re = r"^\s*(\d{1,2})/(\d{1,2})/(\d{4})\s*$"
    t_re = r"^\s*(\d{1,2}):(\d{2})\s*$"
    return F.try_make_timestamp(
        _int_group(date_ddmmyyyy, d_re, 3),
        _int_group(date_ddmmyyyy, d_re, 2),
        _int_group(date_ddmmyyyy, d_re, 1),
        _int_group(time_hhmm, t_re, 1),
        _int_group(time_hhmm, t_re, 2),
        F.lit(0),
    )


def parse_pt_long_date(text: Column) -> Column:
    """Long-form '12 de março de 2024' → date; unknown month name or
    impossible day → NULL. The month lookup is an array-literal index
    (no join, no UDF)."""
    months = F.array(*[F.lit(m) for m in PT_MONTH_NAMES])
    name = F.lower(F.regexp_extract(text, _LONG_RE, 2))
    month = F.array_position(months, name).cast("int")  # 1-based; 0 = not found
    return F.try_make_timestamp(
        _int_group(text, _LONG_RE, 3),
        F.nullif(month, F.lit(0)),
        _int_group(text, _LONG_RE, 1),
        F.lit(0),
        F.lit(0),
        F.lit(0),
    ).cast("date")


def to_iso8601_z(ts: Column, tz: str = TZ_BR) -> Column:
    """Local (default America/Sao_Paulo) naive timestamp → UTC ISO-8601
    'Z' string (dates.py:52-57); honors historical DST via the JVM
    tz database."""
    return F.date_format(
        F.to_utc_timestamp(ts, tz), "yyyy-MM-dd'T'HH:mm:ss'Z'"
    )
