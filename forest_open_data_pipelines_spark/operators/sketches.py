"""Bounded-memory frequency sketches — SpaceSaving heavy hitters.

No reference counterpart (the reference has no streaming/sketch layer);
this is part of the large-scale training-data mandate: exact top-k over
100 TB of events requires a full shuffle of every distinct key, while a
sharded SpaceSaving summary (Metwally, Agrawal, El Abbadi 2005,
"Efficient Computation of Frequent and Top-k Elements in Data Streams",
ICDT) holds O(k) counters per shard and guarantees

    est_count - max_error  <=  true_count  <=  est_count

for every tracked item, and that ANY item with true frequency
> N_shard / k is tracked.  Sharding by ``pmod(user_id, n_shards)``
routes each item to exactly ONE shard's summary, so the per-shard
guarantees are exact (no cross-summary merge error) and the global
heavy hitters are the union of the shard summaries — the standard
distributed key-space-partitioned deployment.

Determinism contract (shared bit-for-bit with the streaming twin in
``streaming/heavy_hitters.py`` and the stdlib twin in tests): events
are processed in ``(ts, event_id)`` order within a shard, and eviction
picks the entry with the smallest ``(count, error, item)`` tuple.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

SPACESAVING_K = 8
SPACESAVING_SHARDS = 4

SKETCH_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("user_id", LongType()),
        StructField("est_count", LongType()),
        StructField("max_error", LongType()),
        StructField("is_exact", BooleanType()),
        StructField("rank", IntegerType()),
        StructField("n_processed", LongType()),
    ]
)


def spacesaving_update(
    counters: dict[int, tuple[int, int]], item: int, k: int
) -> None:
    """One SpaceSaving step on ``counters`` (item -> (count, error)).

    Tracked -> increment.  Room left -> insert (1, 0).  Full -> evict
    the min-(count, error, item) entry and inherit its count as the
    new item's (count+1, error=count) — the classic ICDT §3 update.
    """
    hit = counters.get(item)
    if hit is not None:
        counters[item] = (hit[0] + 1, hit[1])
    elif len(counters) < k:
        counters[item] = (1, 0)
    else:
        evict = min(counters, key=lambda i: (counters[i][0], counters[i][1], i))
        min_count = counters[evict][0]
        del counters[evict]
        counters[item] = (min_count + 1, min_count)


def sketch_rows(
    shard: int, counters: dict[int, tuple[int, int]], n_processed: int
) -> pd.DataFrame:
    """Render a shard's summary as ranked rows (count desc, error asc,
    item asc — the deterministic output order shared by both twins)."""
    ranked = sorted(counters.items(), key=lambda kv: (-kv[1][0], kv[1][1], kv[0]))
    return pd.DataFrame(
        {
            "shard": pd.array([shard] * len(ranked), dtype="int32"),
            "user_id": pd.array([i for i, _ in ranked], dtype="int64"),
            "est_count": pd.array([c for _, (c, _e) in ranked], dtype="int64"),
            "max_error": pd.array([e for _, (_c, e) in ranked], dtype="int64"),
            "is_exact": pd.array([e == 0 for _, (_c, e) in ranked], dtype="bool"),
            "rank": pd.array(range(1, len(ranked) + 1), dtype="int32"),
            "n_processed": pd.array([n_processed] * len(ranked), dtype="int64"),
        }
    )


def spacesaving_topk(
    events: DataFrame, k: int = SPACESAVING_K, n_shards: int = SPACESAVING_SHARDS
) -> DataFrame:
    """Sharded SpaceSaving top-k users by event count.

    One scan: project (shard, user_id, ts, event_id), ONE shuffle —
    ``repartition(shard)`` + ``sortWithinPartitions(shard, ts,
    event_id)`` puts each shard's rows in contract order on disk, and
    a ``mapInPandas`` kernel streams the Arrow batches INCREMENTALLY:
    memory is O(k · shards-per-partition) counters plus one Arrow
    batch, never a materialized shard (grouped applyInPandas would
    hand the kernel the whole group as one pandas frame — the
    original shape, rejected in review).  At 100 TB the same plan
    holds: n_shards scales with the cluster, state stays
    O(k · n_shards) regardless of row count or key cardinality.
    """
    from collections.abc import Iterator

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # rows arrive shard-clustered and (ts, event_id)-sorted; a
        # partition may hold several shards (hash co-location), each
        # with its own O(k) counter dict
        counters: dict[int, dict[int, tuple[int, int]]] = {}
        seen: dict[int, int] = {}
        for pdf in batches:
            shards = pdf["shard"].astype("int64")
            items = pdf["user_id"].astype("int64")
            for shard, item in zip(shards, items):
                c = counters.setdefault(int(shard), {})
                spacesaving_update(c, int(item), k)
                seen[int(shard)] = seen.get(int(shard), 0) + 1
        for shard in sorted(counters):
            yield sketch_rows(shard, counters[shard], seen[shard])

    projected = events.select(
        F.pmod(F.col("user_id"), F.lit(n_shards)).cast("int").alias("shard"),
        "user_id",
        "ts",
        "event_id",
    )
    return (
        projected.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "ts", "event_id")
        .mapInPandas(_kernel, SKETCH_SCHEMA)
        .orderBy("shard", "rank")
    )


def distinct_rollup_sketch(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """Mergeable distinct-user rollup: daily HLL sketches union into
    monthly estimates WITHOUT re-touching the fact rows.

    The at-scale pattern behind every "distinct users per <coarser
    grain>" dashboard: exact monthly recounts re-shuffle the raw fact
    per grain, while Datasketches HLL (Spark 4 built-ins
    ``hll_sketch_agg`` / ``hll_union_agg`` — JVM-side, map-side
    combinable) aggregates once at the finest grain and every coarser
    grain is a union over sketch BINARIES (bytes per group, not rows).
    The union-merge property (sketch(A ∪ B) == union(sketch(A),
    sketch(B)) — exactly, same binary state) is asserted in tests
    against directly-built monthly sketches, alongside the standard
    HLL error envelope vs exact counts.

    Rows-only: the estimate is Datasketches-internal (no DuckDB twin);
    the exact column rides along for observability and the error-ppm
    invariant.
    """
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sk"))
    monthly = daily.groupBy(
        "event_type", F.date_trunc("month", "day").cast("date").alias("month")
    ).agg(F.hll_union_agg("sk").alias("sk"))
    exact = events.groupBy(
        F.col("event_type").alias("e_type"),
        F.date_trunc("month", F.to_date("ts")).cast("date").alias("e_month"),
    ).agg(F.count_distinct("user_id").alias("exact_distinct"))
    # NULL-SAFE join keys: a feed with unparseable timestamps forms a
    # month=NULL group on BOTH sides — an inner equi-join would drop
    # it silently (the spine_fill null-passthrough lesson); eqNullSafe
    # keeps the null bucket visible.
    return (
        monthly.join(
            exact,
            monthly["event_type"].eqNullSafe(exact["e_type"])
            & monthly["month"].eqNullSafe(exact["e_month"]),
        )
        .select(
            "event_type",
            "month",
            F.hll_sketch_estimate("sk").cast("long").alias("est_distinct"),
            "exact_distinct",
        )
        .orderBy("event_type", "month")
    )
