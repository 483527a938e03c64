"""Streaming SpaceSaving heavy hitters — bounded-sketch state per key.

The streaming twin of ``operators.sketches.spacesaving_topk``: the
events feed is a Structured Streaming source, each shard's O(k)
SpaceSaving summary lives in the state store via
``applyInPandasWithState``, and every micro-batch emits the shard's
current ranked summary (update mode).  This is the §I state-store
class the sketch family was missing: unlike sessions/SCD2 (state =
per-key scalars) or cadence (state = running moments), the state here
is a BOUNDED SKETCH — three parallel arrays of at most k entries —
whose size is independent of both the stream length and the key
cardinality, the property that makes it deployable against an
unbounded 100 TB/day feed where exact per-key counting state would
grow without bound.

Determinism contract shared with the batch twin (module docstring of
``operators/sketches.py``): rows sort ``(ts, event_id)`` within each
micro-batch, eviction is min-``(count, error, item)``.  Draining a
single-file source (one micro-batch) reproduces the batch summary
bit-for-bit; across multiple micro-batches the summary is exactly the
batch sketch of the concatenated batch-order stream (SpaceSaving is
sequential, so any prefix order is a valid stream order).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from ..operators.sketches import (
    SPACESAVING_K,
    SPACESAVING_SHARDS,
    SKETCH_SCHEMA,
    sketch_rows,
    spacesaving_update,
)

STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errors", ArrayType(LongType())),
        StructField("n_processed", LongType()),
    ]
)


def _make_update(k: int):
    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            items, counts, errors, n_processed = state.get
            counters = {
                int(i): (int(c), int(e))
                for i, c, e in zip(items, counts, errors)
            }
        else:
            counters, n_processed = {}, 0

        # CONCATENATE the Arrow chunks BEFORE sorting (the scd2.py
        # contract): chunks arrive in arbitrary order, so a per-chunk
        # sort would break the (ts, event_id) determinism contract
        # for micro-batches past maxRecordsPerBatch.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            merged = pd.concat(chunks).sort_values(
                ["ts", "event_id"], kind="mergesort"
            )
            for item in merged["user_id"].astype("int64"):
                spacesaving_update(counters, int(item), k)
            n_processed += len(merged)

        state.update(
            (
                list(counters.keys()),
                [c for c, _e in counters.values()],
                [e for _c, e in counters.values()],
                n_processed,
            )
        )
        yield sketch_rows(int(shard), counters, n_processed)

    return _update


def heavy_hitters_stream(
    events_stream: DataFrame,
    k: int = SPACESAVING_K,
    n_shards: int = SPACESAVING_SHARDS,
) -> DataFrame:
    """Per-shard SpaceSaving summary over the event stream.

    Output (update mode): the shard's full ranked summary each
    micro-batch it receives rows — ``n_processed`` is monotone per
    shard, so the freshest summary is the max-``n_processed`` row set.
    """
    return (
        events_stream.select(
            F.pmod(F.col("user_id"), F.lit(n_shards)).cast("int").alias("shard"),
            "user_id",
            "ts",
            "event_id",
        )
        .groupBy("shard")
        .applyInPandasWithState(
            _make_update(k),
            outputStructType=SKETCH_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
