"""Streaming SCD2 maintenance — the stateful streaming twin of
``operators.sessionize.scd2_user_state_history``.

Per-user state is the one OPEN run (version, state, valid_from,
last_seen, n_events). An arriving event either extends the open run
(same ``event_type``) or CLOSES it — the closed run is emitted with
``valid_to`` = the new event's timestamp and the same 1-based
``version`` numbering the batch operator produces, so a drained
stream's closed runs are row-identical to the batch history minus each
user's final (still-current) run. Tests assert exactly that.

This is how a CDC pipeline maintains a type-2 dimension incrementally:
O(1) state per key regardless of stream length, closed intervals
appended to the history table the moment the next change arrives —
no nightly full rebuild of the fact-sized change log. Closure here is
data-driven (the next differing event); a production job would add a
GroupStateTimeout flush for keys that stop changing — omitted so
results stay deterministic for parity testing (the sessions-twin
convention, streaming/sessions.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("version", LongType()),
        StructField("state", StringType()),
        StructField("valid_from_us", LongType()),
        StructField("last_seen_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("version", LongType()),
        StructField("state", StringType()),
        StructField("valid_from", TimestampType()),
        StructField("last_seen", TimestampType()),
        StructField("n_events", LongType()),
        StructField("valid_to", TimestampType()),
        StructField("is_current", BooleanType()),
    ]
)


def _closed_run(
    user_id: int,
    version: int,
    state: str,
    valid_from_us: int,
    last_seen_us: int,
    n_events: int,
    valid_to_us: int,
) -> dict[str, Any]:
    return {
        "user_id": user_id,
        "version": version,
        "state": state,
        "valid_from": pd.Timestamp(valid_from_us, unit="us"),
        "last_seen": pd.Timestamp(last_seen_us, unit="us"),
        "n_events": n_events,
        "valid_to": pd.Timestamp(valid_to_us, unit="us"),
        "is_current": False,
    }


def _update_runs(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        version, cur_state, from_us, seen_us, n = state.get
    else:
        version, cur_state, from_us, seen_us, n = 0, None, None, None, 0

    out: list[dict[str, Any]] = []
    # CONCATENATE the Arrow chunks BEFORE sorting: one micro-batch
    # delivers a key's rows as an iterator of chunks in arbitrary
    # order, so a per-chunk sort (the first-cut implementation) would
    # process a >maxRecordsPerBatch backfill out of (ts, event_id)
    # order and corrupt the run history. Cross-BATCH order stays the
    # stream contract, as in sessions.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    merged = (
        pd.concat(chunks).sort_values(["ts", "event_id"])
        if chunks
        else None
    )
    if merged is not None:
        for ts, etype in zip(merged["ts"], merged["event_type"]):
            ts_us = ts.value // 1000
            # version == 0 is the ONLY no-open-run sentinel: a NULL
            # tracked state is an ordinary run (the batch operator's
            # eqNullSafe semantics), so compare null-safely instead of
            # overloading None.
            if version == 0:
                version, cur_state = 1, etype
                from_us, seen_us, n = ts_us, ts_us, 1
            elif (etype == cur_state) or (etype is None and cur_state is None):
                seen_us = ts_us
                n += 1
            else:
                out.append(
                    _closed_run(
                        user_id, version, cur_state, from_us, seen_us, n, ts_us
                    )
                )
                version += 1
                cur_state = etype
                from_us, seen_us, n = ts_us, ts_us, 1

    state.update((version, cur_state, from_us, seen_us, n))
    yield pd.DataFrame(
        out,
        columns=[f.name for f in OUTPUT_SCHEMA.fields],
    ).astype(
        {"user_id": "int64", "version": "int64", "n_events": "int64"}
        if out
        else {}
    )


def scd2_stream(events_stream: DataFrame, state=None) -> DataFrame:
    """Per-user SCD2 run maintenance over the event stream; emits each
    run the moment the next state change closes it (append semantics).

    ``state`` overrides the tracked attribute (any Column over the
    events row, pre-aggregation — the batch operator's ``state``
    override, cast to string for the state-store schema); default
    ``event_type``."""
    from pyspark.sql import functions as F

    state = F.col("event_type") if state is None else state.cast("string")
    return events_stream.select(
        "user_id", "ts", "event_id", state.alias("event_type")
    ).groupBy("user_id").applyInPandasWithState(
        _update_runs,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
