"""Streaming observation-store append — the stateful streaming twin of
``operators.freshness.freshness_observations_append``.

The reference appends observations in nightly batches
(``freshness/storage.py:91-151``), carrying a ``latest`` map keyed by
(watch_id, resource_key) forward through the batch; the batch operator
re-expresses that fold as a lag window. Here the SAME fold runs
continuously: the latest (source timestamp string, parsed micros) pair
per key lives in the state store via ``applyInPandasWithState`` —
bounded state (two scalars per key), append output mode, no buffering
of raw events. Every emitted row carries the precision-aware
``changed`` flag and the exact integer-cents intervals, byte-compatible
with the batch operator (parity asserted in tests once the stream
drains, including across multiple micro-batches — state carries the
chain over batch boundaries exactly like the reference's map carries
it over nightly runs).

Ordering contract (same as the reference's append loop): batches must
arrive in source-time order per key — the fold sorts WITHIN a batch by
(ts, event_id), and the state chain assumes batch N+1's events are not
older than batch N's for the same key. A feed that can deliver late
rows needs a watermark-and-reorder stage upstream (the windowed module
pattern); the nightly-append use case this mirrors polls forward-only.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("prev_str", StringType()),
        StructField("prev_ts_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("watch_id", LongType()),
        StructField("resource_key", StringType()),
        StructField("ts", TimestampType()),
        StructField("source_modified_at", StringType()),
        StructField("precision", StringType()),
        StructField("status", StringType()),
        StructField("previous_source_modified_at", StringType()),
        StructField("changed", BooleanType()),
        StructField("interval_hours", DoubleType()),
        StructField("interval_days", DoubleType()),
    ]
)

_EPOCH = pd.Timestamp(0)


def _cents(diff_us: int, unit_us: int) -> float:
    """Exact integer half-up at 2 dp — the micro_div convention shared
    with the batch operator's Catalyst expression."""
    return (
        diff_us // unit_us + (1 if (diff_us % unit_us) * 2 >= unit_us else 0)
    ) / 100.0


def _append_fold(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    watch_id, resource_key = key
    prev_str, prev_us = state.get if state.exists else ("", None)
    out: list[tuple] = []
    rows: list[tuple] = []
    for pdf in pdfs:
        rows.extend(
            zip(
                pdf["ts"], pdf["event_id"], pdf["status"],
                pdf["source_modified_at"], pdf["precision"],
            )
        )
    # event order within the batch — the reference appends in feed
    # order; the batch twin's lag window orders identically
    rows.sort(key=lambda r: (r[0], r[1]))
    for ts, _eid, status, cur, precision in rows:
        ts_us = int((ts - _EPOCH).value // 1_000)
        changed = False
        ih = idays = None
        if status == "ok" and cur and prev_str:
            if precision == "date":
                same = ts.date() == pd.Timestamp(prev_us * 1_000).date()
            else:
                same = cur == prev_str
            changed = not same
            if changed:
                diff = ts_us - prev_us
                ih = _cents(diff, 36_000_000)
                idays = _cents(diff, 864_000_000)
        out.append(
            (
                watch_id, resource_key, ts, cur, precision, status,
                prev_str, changed, ih, idays,
            )
        )
        prev_str, prev_us = cur, (ts_us if status == "ok" else prev_us)
        if status != "ok":
            # an error probe's parse is None — the next change interval
            # must come from the last OK timestamp string the reference
            # would re-parse, which is '' here, so clear it
            prev_us = None
    state.update((prev_str, prev_us))
    yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def observations_append_stream(events_stream: DataFrame) -> DataFrame:
    """events stream → per-observation append rows with the latest
    (watch, resource) source timestamp carried in the state store.
    Derivation (status/precision/modified) is the SHARED batch
    projection, so stream and batch rows are identical by
    construction; ``observed_at`` is omitted (the batch scalar is the
    append call's clock — a stream has no global max)."""
    from forest_open_data_pipelines_spark.operators.freshness import (
        observations_from_events,
    )

    obs = observations_from_events(events_stream)
    return obs.groupBy("watch_id", "resource_key").applyInPandasWithState(
        _append_fold,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
