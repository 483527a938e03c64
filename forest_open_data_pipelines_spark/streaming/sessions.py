"""Streaming sessionization — the stateful streaming twin of
``operators.sessionize.events_sessionize``.

Per-user state is one OPEN session (start, last_ts, n, sum) plus the
count of sessions closed so far. A new event either extends the open
session (gap ≤ 30 min) or closes it — the closed session is emitted
with the same columns and the same ``session_seq`` numbering the batch
operator produces, so a drained stream's closed sessions are
row-identical to the batch result minus each user's final
(still-open) session. Tests assert exactly that.

State is O(1) per user regardless of stream length — the shape that
holds at 100 TB/day. Session closure here is data-driven (next event
arrives past the gap); a production monitor would add a processing-time
timeout (GroupStateTimeout) to also flush sessions for users who went
silent — omitted so results stay deterministic for parity testing.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from forest_open_data_pipelines_spark.operators.sessionize import SESSION_GAP_MINUTES

STATE_SCHEMA = StructType(
    [
        StructField("closed_sessions", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_seq", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("duration_minutes", DoubleType()),
    ]
)

_US_PER_MIN = 60 * 1_000_000


def _round_half_up(v: float, dp: int) -> float:
    """Spark's F.round is HALF_UP on the decimal rendering of the
    double; Python's built-in round is banker's — they disagree one ulp
    at exact .5 boundaries, which breaks batch-parity equality."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(v)).quantize(Decimal(f"1e-{dp}"), rounding=ROUND_HALF_UP))


def _session_row(
    user_id: int, seq: int, start_us: int, last_us: int, n: int, total: float
) -> dict[str, Any]:
    return {
        "user_id": user_id,
        "session_seq": seq,
        "session_start": pd.Timestamp(start_us, unit="us"),
        "session_end": pd.Timestamp(last_us, unit="us"),
        "n_events": n,
        "total_value": _round_half_up(total, 2),
        # scale-then-round, the batch twin's exact formula
        # (operators/sessionize.py duration_minutes): round(µs/60) at
        # 0 dp half-up, then /10⁶ — N.5 doubles are exact so this
        # matches F.round(µs/60.0, 0)/1e6 on every input
        "duration_minutes": _round_half_up((last_us - start_us) / 60.0, 0) / 1e6,
    }


def _update_sessions(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    gap_us = SESSION_GAP_MINUTES * _US_PER_MIN
    if state.exists:
        closed, start_us, last_us, n, total = state.get
    else:
        closed, start_us, last_us, n, total = 0, None, None, 0, 0.0

    out: list[dict[str, Any]] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, value in zip(pdf["ts"], pdf["value"]):
            ts_us = ts.value // 1000
            if start_us is None:
                start_us, last_us, n, total = ts_us, ts_us, 1, float(value)
            elif ts_us - last_us > gap_us:
                closed += 1
                out.append(
                    _session_row(user_id, closed - 1, start_us, last_us, n, total)
                )
                start_us, last_us, n, total = ts_us, ts_us, 1, float(value)
            else:
                last_us = ts_us
                n += 1
                total += float(value)

    state.update((closed, start_us, last_us, n, total))
    yield pd.DataFrame(
        out,
        columns=[f.name for f in OUTPUT_SCHEMA.fields],
    ).astype(
        {"user_id": "int64", "session_seq": "int64", "n_events": "int64"}
        if out
        else {}
    )


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """Per-user gap sessionization over the event stream; emits each
    session the moment an event closes it (append semantics)."""
    return events_stream.select("user_id", "ts", "event_id", "value").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _update_sessions,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
