"""Stateful streaming funnel — the incremental twin of
``operators.sessionize.event_funnel``.

Per-user state is three optional timestamps (first view, first
qualifying click, first qualifying purchase) — O(1) per key, the
textbook ``applyInPandasWithState`` shape. Every transition is
set-once ("first event that qualifies"), which makes the operator
IDEMPOTENT under replay: re-delivering an already-processed event
cannot change the state, so at-least-once sources converge.

Ordering contract: within a micro-batch events are sorted by
(ts, event_id); across batches the funnel assumes per-user in-order
delivery (same contract as the stateful sessionizer) — a view
arriving AFTER a later view was already accepted cannot retroactively
lower the step-1 timestamp, because that would require replaying the
click/purchase chain against the earlier anchor (unbounded history).
Under in-order delivery the drained per-user rows are exactly the
batch operator's min-timestamp chain — asserted in
tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("tv_us", LongType()),
        StructField("tc_us", LongType()),
        StructField("tp_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t_view", TimestampType()),
        StructField("t_click", TimestampType()),
        StructField("t_purchase", TimestampType()),
    ]
)


def _ts_or_none(us: int | None) -> pd.Timestamp | None:
    return pd.Timestamp(us, unit="us") if us is not None else None


def _update_funnel(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    tv, tc, tp = state.get if state.exists else (None, None, None)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, etype in zip(pdf["ts"], pdf["event_type"]):
            ts_us = ts.value // 1000
            if etype == "view":
                if tv is None:
                    tv = ts_us
            elif etype == "click":
                if tc is None and tv is not None and ts_us > tv:
                    tc = ts_us
            elif etype == "purchase":
                if tp is None and tc is not None and ts_us > tc:
                    tp = ts_us
    state.update((tv, tc, tp))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "t_view": [_ts_or_none(tv)],
            "t_click": [_ts_or_none(tc)],
            "t_purchase": [_ts_or_none(tp)],
        }
    )


def funnel_stream(events_stream: DataFrame) -> DataFrame:
    """Per-user funnel state machine; update-mode output emits the
    cumulative (t_view, t_click, t_purchase) row for every user seen
    in the micro-batch."""
    return (
        events_stream.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
