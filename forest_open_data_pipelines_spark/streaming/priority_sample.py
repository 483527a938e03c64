"""Streaming weighted sampler — order-independent top-k state.

The streaming twin of ``operators.curation.priority_sample``
(sequential Poisson / priority sampling): documents arrive as a
stream and each shard's top-(n+1) priority candidates live in the
state store.  Like the Pareto-frontier monitor (``skyline.py``) this
state is a pure SET function:

* the top-(n+1) of a set is order-independent — any micro-batch
  interleaving converges to the same state, so drain parity needs no
  ordering contract (pinned by splitting the input on an arbitrary
  odd/even predicate);
* the state is MONOTONE and bounded at n+1 (doc, weight, priority)
  tuples per shard regardless of stream length.

Sharding: key-space partition by ``doc_id % n_shards``.  Per-shard
top-(n+1) sets OVERAPPROXIMATE the global answer (every member of the
global top-(n+1) is inside its own shard's top-(n+1)), so the consumer
folds the drained candidates — ≤ shards·(n+1) rows — through the batch
operator's own ``priority_sample_tail``, reproducing the batch sample,
τ, and the max(w, τ) estimator EXACTLY.

The priority itself is computed by the shared ``priority_key_col``
Catalyst expression BEFORE the state shuffle (two exactly-rounded IEEE
divisions — never recomputed Python-side), so batch and stream agree
bit-for-bit on every key.
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
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.curation import (
    PRIORITY_SAMPLE_N,
    priority_key_col,
    priority_sample_tail,
)

PRIORITY_STREAM_SHARDS = 4

STATE_SCHEMA = StructType(
    [
        StructField("doc_ids", ArrayType(LongType())),
        StructField("weights", ArrayType(LongType())),
        StructField("langs", ArrayType(StringType())),
        StructField("sources", ArrayType(StringType())),
        StructField("priorities", ArrayType(DoubleType())),
        StructField("n_seen", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("weight", LongType()),
        StructField("priority", DoubleType()),
        StructField("n_seen", LongType()),
    ]
)


def _make_update(keep: int):
    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            doc_ids, weights, langs, sources, priorities, n_seen = state.get
            cand = [
                (float(p), int(d), int(w), l, s)
                for p, d, w, l, s in zip(
                    priorities, doc_ids, weights, langs, sources
                )
            ]
        else:
            cand, n_seen = [], 0

        for pdf in pdfs:
            n_seen += len(pdf)
            cand.extend(
                zip(
                    (float(x) for x in pdf["priority"]),
                    (int(x) for x in pdf["doc_id"]),
                    (int(x) for x in pdf["weight"]),
                    pdf["lang"],
                    pdf["source"],
                )
            )
        # top-(keep) of the accumulated set — (priority DESC, doc_id)
        cand.sort(key=lambda t: (-t[0], t[1]))
        cand = cand[:keep]

        state.update(
            (
                [d for _p, d, _w, _l, _s in cand],
                [w for _p, _d, w, _l, _s in cand],
                [l for _p, _d, _w, l, _s in cand],
                [s for _p, _d, _w, _l, s in cand],
                [p for p, _d, _w, _l, _s in cand],
                n_seen,
            )
        )
        yield pd.DataFrame(
            {
                "shard": pd.array([int(shard)] * len(cand), dtype="int32"),
                "doc_id": pd.array([d for _p, d, *_ in cand], dtype="int64"),
                "lang": [l for _p, _d, _w, l, _s in cand],
                "source": [s for *_unused, s in cand],
                "weight": pd.array(
                    [w for _p, _d, w, _l, _s in cand], dtype="int64"
                ),
                "priority": pd.array(
                    [p for p, *_ in cand], dtype="float64"
                ),
                "n_seen": pd.array([n_seen] * len(cand), dtype="int64"),
            }
        )

    return _update


def priority_sample_stream(
    documents_stream: DataFrame,
    n: int = PRIORITY_SAMPLE_N,
    n_shards: int = PRIORITY_STREAM_SHARDS,
) -> DataFrame:
    """Per-shard running top-(n+1) weighted-sample candidates.

    Output (update mode): each touched shard's full candidate set per
    micro-batch — ``n_seen`` is monotone per shard, so the freshest
    set is the max-``n_seen`` emission; fold the union through
    ``fold_priority_candidates`` to recover the batch sample."""
    return (
        documents_stream.select(
            F.pmod(F.col("doc_id"), F.lit(n_shards))
            .cast("int")
            .alias("shard"),
            "doc_id",
            "lang",
            "source",
            F.col("n_chars").cast("long").alias("weight"),
            priority_key_col().alias("priority"),
        )
        .groupBy("shard")
        .applyInPandasWithState(
            _make_update(n + 1),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def fold_priority_candidates(
    candidates: DataFrame, n: int = PRIORITY_SAMPLE_N
) -> DataFrame:
    """Fold drained per-shard candidate emissions to the batch
    ``priority_sample`` output: keep each shard's freshest emission
    (max ``n_seen``), then run the batch operator's own top-(n+1) →
    τ → estimator tail over the ≤ shards·(n+1) surviving rows."""
    from pyspark.sql import Window

    w = Window.partitionBy("shard")
    fresh = (
        candidates.withColumn("_mx", F.max("n_seen").over(w))
        .where(F.col("n_seen") == F.col("_mx"))
        .select("doc_id", "lang", "source", "weight", "priority")
    )
    return priority_sample_tail(fresh, n)
