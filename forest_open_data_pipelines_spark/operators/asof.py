"""As-of (point-in-time) join.

Spark has no native ASOF JOIN (DuckDB/Pandas ``merge_asof`` do). The
scalable re-expression: tag both sides, union them, and carry the right
side's payload forward with a ``last(ignorenulls)`` running window per
key — one shuffle on the key, O(n log n) sort per partition, instead of
the O(n·m)-per-key range join a naive ``ON key = key AND r.ts <= l.ts``
predicate produces.

Scale notes (100 TB):
- The union shuffles once on the join key; the window sort rides the
  same partitioning. No broadcast, no cross product, skew handled by
  AQE like any other keyed shuffle.
- Tie-break: right rows sort BEFORE left rows at the same timestamp, so
  ``right_ts <= left_ts`` (inclusive) semantics match DuckDB's ASOF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: each left row gains the payload of the latest
    right row with ``right.ts <= left.ts`` for the same key (NULLs when
    no right row precedes it).

    Both inputs must share ``key`` and ``ts`` column names; every other
    right column is carried over as ``{right_prefix}{col}``, plus
    ``{right_prefix}{ts}`` for the matched timestamp.
    """
    rcols = [c for c in right.columns if c not in (key, ts)]
    lcols = [c for c in left.columns if c not in (key, ts)]
    l2 = left.select(
        key,
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *lcols,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(right_prefix + c)
            for c in rcols
        ],
        F.lit(None).cast(right.schema[ts].dataType).alias(right_prefix + ts),
    )
    r2 = right.select(
        key,
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(right_prefix + c) for c in rcols],
        F.col(ts).alias(right_prefix + ts),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(right_prefix + c, ignorenulls=True).over(w).alias(right_prefix + c)
        for c in [*rcols, ts]
    ]
    return (
        l2.unionByName(r2)
        .select(key, F.col("_ts").alias(ts), "_side", *lcols, *carried)
        .where(F.col("_side") == 1)
        .drop("_side")
    )


def range_window_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    window_seconds: int,
    ts: str = "ts",
    right_prefix: str = "w_",
) -> DataFrame:
    """Left range join: pair each left row with every right row of the
    same key inside ``(left.ts - window, left.ts]`` (left rows with no
    match keep one all-NULL right payload).

    Scalable shape: both sides are bucketed into ``window_seconds``
    epochs and the left side probes its own and the previous bucket —
    the equi-join on (key, bucket) is what shuffles, and Catalyst keeps
    the range predicate as a join filter on that hash join. A right row
    is at most ``window`` older than its match, so two probe buckets
    are always sufficient; no time-range cross join ever forms.
    """
    bucket = lambda c: (F.unix_micros(F.col(c)) / (window_seconds * 1_000_000)).cast(
        "long"
    )  # noqa: E731
    rcols = [c for c in right.columns if c != key]
    r2 = right.select(
        F.col(key).alias("_rkey"),
        bucket(ts).alias("_rbucket"),
        *[F.col(c).alias(right_prefix + c) for c in rcols],
    )
    probes = left.withColumn("_probe", F.explode(F.array(F.lit(0), F.lit(1)))).withColumn(
        "_lbucket", bucket(ts) - F.col("_probe")
    )
    rts = F.col(right_prefix + ts)
    cond = (
        (probes[key] == r2["_rkey"])
        & (F.col("_lbucket") == r2["_rbucket"])
        & (rts > F.col(ts) - F.expr(f"INTERVAL {window_seconds} SECOND"))
        & (rts <= F.col(ts))
    )
    return probes.join(r2, cond, "left").drop("_probe", "_lbucket", "_rkey", "_rbucket")


def clicks_before_purchase(events: DataFrame, window_minutes: int = 30) -> DataFrame:
    """Per purchase: count and value of the same user's clicks in the
    preceding ``window_minutes`` (range-join twin of the as-of
    attribution above).

    The two probe rows per purchase collapse in the final groupBy;
    ``count(click col)`` ignores the NULL rows unmatched probes
    produce, so purchases with no nearby click report 0.
    """
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = range_window_join(
        purchases, clicks, key="user_id", window_seconds=window_minutes * 60
    )
    return (
        joined.groupBy(
            "user_id",
            F.col("event_id").alias("purchase_event_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .agg(
            F.count("w_event_id").alias("n_clicks"),
            F.round(F.coalesce(F.sum("w_value"), F.lit(0.0)), 6).alias("click_value"),
        )
        .orderBy("user_id", "purchase_ts", "purchase_event_id")
    )


def events_asof_attribution(events: DataFrame) -> DataFrame:
    """Last-touch attribution: for each purchase event, the latest
    preceding click of the same user, with the gap in minutes.

    Reference analog: merge.py's keep-latest-by-key merge operates on a
    static key; this is its temporal generalization (and the op an LLM
    training pipeline needs to align document snapshots to crawl
    timestamps).
    """
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(purchases, clicks, key="user_id", ts="ts", right_prefix="click_")
    gap_min = (F.unix_micros("ts") - F.unix_micros("click_ts")) / 60_000_000.0
    return joined.select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
        "click_event_id",
        "click_ts",
        F.col("click_value").alias("click_value"),
        F.round(gap_min, 6).alias("minutes_since_click"),
    ).orderBy("user_id", "purchase_ts", "purchase_event_id")
