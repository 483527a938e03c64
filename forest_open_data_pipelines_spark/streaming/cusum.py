"""Streaming CUSUM monitor — sequential detection in the state store.

The batch ``cusum_change_points`` distributes Page's recursion through
the reflection identity; on a stream the recursion itself is the
natural form — CUSUM was DESIGNED as an online algorithm, and its
state is two scalars per series (the running statistic and the open
day's partial count), the smallest state of any §I operator.

Contract (the production monitoring form): the target daily rate and
alarm threshold are CONFIGURED, not estimated — estimating the mean
from an unbounded stream would couple every emission to the whole
history.  A day CLOSES when a later day's first event arrives; closing
emits the day's row (and a zero-count row for every skipped calendar
day, mirroring the batch spine), steps S = max(0, S + (n − target)),
and re-arms.  Events are consumed in (ts, event_id) order per
micro-batch with the forward-only ordering contract of
``streaming/observations.py``: a day older than the open day would be
data arriving after its day closed, impossible under in-order feeds.
A row that VIOLATES the contract across micro-batches (its day
precedes the open day) is NOT silently folded into the open day
(r11 ADVICE): it is dropped and counted in the per-series ``n_late``
state, surfaced on every emitted row — so contract violations are
observable instead of corrupting n_events/cusum.

Batch parity (tests/test_streaming.py): drained stream ==
``operators.sessionize.cusum_fixed_target`` minus each series' still
-open final day.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import date, timedelta
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DateType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("s", LongType()),
        StructField("open_day_ord", LongType()),
        StructField("open_count", LongType()),
        StructField("n_late", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("day", DateType()),
        StructField("n_events", LongType()),
        StructField("cusum", LongType()),
        StructField("alarm", BooleanType()),
        StructField("n_late", LongType()),
    ]
)


def _make_update(target_per_day: int, threshold: int):
    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.exists:
            s, open_ord, open_count, n_late = state.get
        else:
            s, open_ord, open_count, n_late = 0, None, 0, 0

        out_days: list[date] = []
        out_n: list[int] = []
        out_s: list[int] = []
        out_late: list[int] = []

        def close_through(new_ord: int) -> None:
            # close the open day, then zero rows for skipped days
            nonlocal s, open_ord, open_count
            for ord_ in range(open_ord, new_ord):
                n = open_count if ord_ == open_ord else 0
                s = max(0, s + (n - target_per_day))
                out_days.append(date.fromordinal(ord_))
                out_n.append(n)
                out_s.append(s)
                out_late.append(n_late)
            open_ord, open_count = new_ord, 0

        # CONCATENATE the Arrow chunks BEFORE sorting (the scd2.py
        # contract): chunks arrive in arbitrary order, so a per-chunk
        # sort would step days out of order past maxRecordsPerBatch.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            merged = pd.concat(chunks).sort_values(
                ["ts", "event_id"], kind="mergesort"
            )
            for ts in merged["ts"]:
                if pd.isna(ts):  # null-ts guard, the batch twin's
                    continue  # daily.where(day IS NOT NULL) filter
                d_ord = ts.date().toordinal()
                if open_ord is None:
                    open_ord = d_ord
                elif d_ord > open_ord:
                    close_through(d_ord)
                elif d_ord < open_ord:
                    # forward-only contract violated across micro-
                    # batches: drop + count instead of silently
                    # misattributing to the open day (r11 ADVICE)
                    n_late += 1
                    continue
                open_count += 1

        state.update((s, open_ord, open_count, n_late))
        yield pd.DataFrame(
            {
                "event_type": pd.array(
                    [event_type] * len(out_days), dtype="str"
                ),
                "day": pd.Series(out_days, dtype="object"),
                "n_events": pd.array(out_n, dtype="int64"),
                "cusum": pd.array(out_s, dtype="int64"),
                "alarm": pd.array(
                    [v > threshold for v in out_s], dtype="bool"
                ),
                "n_late": pd.array(out_late, dtype="int64"),
            }
        )

    return _update


def cusum_monitor_stream(
    events_stream: DataFrame, target_per_day: int, threshold: int
) -> DataFrame:
    """Per-event-type fixed-target CUSUM over the event stream.

    Output (append-style update mode): one row per CLOSED day per
    series, carrying the stepped statistic, the alarm flag, and the
    cumulative ``n_late`` contract-violation counter (rows whose day
    preceded the already-open day — dropped, never misattributed)."""
    return (
        events_stream.select("event_type", "ts", "event_id")
        .groupBy("event_type")
        .applyInPandasWithState(
            _make_update(target_per_day, threshold),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
