"""Streaming distinct-count monitor — bounded KMV bottom-k state.

The streaming twin of ``operators.sketches.kmv_distinct_rollup``: the
events feed streams in and each (event_type, month) group's k smallest
distinct 60-bit md5 user hashes live in the state store.  Like the
priority-sampler twin (``priority_sample.py``) the state is a pure SET
function:

* the bottom-k of a set is order-independent — any micro-batch
  interleaving converges to the same state, so drain parity needs no
  ordering contract (pinned by splitting the input on an arbitrary
  odd/even predicate);
* the state is MONOTONE (hashes only ever get smaller) and bounded at
  k int64 hashes per group regardless of stream length or user
  cardinality.

The hash is computed by the shared ``kmv_hash_col`` Catalyst
expression BEFORE the state shuffle, so batch and stream agree
bit-for-bit on every set member; the consumer folds the drained
candidate emissions — ≤ k rows per group — through the batch
operator's own ``kmv_sketch_tail``, reproducing the batch
``n_candidates`` / ``est_distinct`` sketch columns EXACTLY (the
``exact_distinct`` observability column is batch-only by
construction: no bounded state can carry it past k distinct users).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DateType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.sketches import KMV_K, kmv_hash_col, kmv_sketch_tail

STATE_SCHEMA = StructType(
    [
        StructField("hashes", ArrayType(LongType())),
        StructField("n_seen", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("month", DateType()),
        StructField("h", LongType()),
        StructField("rank", IntegerType()),
        StructField("n_seen", LongType()),
    ]
)


def _make_update(k: int):
    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        event_type, month = key
        if state.exists:
            (hashes, n_seen) = state.get
            kept = set(int(h) for h in hashes)
        else:
            kept, n_seen = set(), 0

        for pdf in pdfs:
            n_seen += len(pdf)
            kept.update(int(h) for h in pdf["h"])
        # bottom-k of the accumulated set
        bottom = sorted(kept)[:k]

        state.update((list(bottom), n_seen))
        yield pd.DataFrame(
            {
                "event_type": [event_type] * len(bottom),
                "month": [month] * len(bottom),
                "h": pd.array(bottom, dtype="int64"),
                "rank": pd.array(range(1, len(bottom) + 1), dtype="int32"),
                "n_seen": pd.array([n_seen] * len(bottom), dtype="int64"),
            }
        )

    return _update


def kmv_distinct_stream(
    events_stream: DataFrame, k: int = KMV_K
) -> DataFrame:
    """Per-(event_type, month) running bottom-k distinct-hash
    candidates.

    Output (update mode): each touched group's full candidate set per
    micro-batch — ``n_seen`` is monotone per group, so the freshest
    set is the max-``n_seen`` emission; fold the union through
    ``fold_kmv_candidates`` to recover the batch sketch columns."""
    return (
        events_stream.select(
            "event_type",
            F.date_trunc("month", F.to_date("ts")).cast("date").alias("month"),
            kmv_hash_col().alias("h"),
        )
        .groupBy("event_type", "month")
        .applyInPandasWithState(
            _make_update(k),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def fold_kmv_candidates(
    candidates: DataFrame, k: int = KMV_K
) -> DataFrame:
    """Fold drained per-group candidate emissions to the batch sketch
    columns: keep each group's freshest emission (max ``n_seen``),
    then run the batch operator's own bottom-k → (k−1)/u_(k) tail."""
    from pyspark.sql import Window

    w = Window.partitionBy("event_type", "month")
    fresh = (
        candidates.withColumn("_mx", F.max("n_seen").over(w))
        .where(F.col("n_seen") == F.col("_mx"))
        .select("event_type", "month", "h")
    )
    return kmv_sketch_tail(fresh, k).select(
        "event_type", "month", "n_candidates", "est_distinct"
    )
