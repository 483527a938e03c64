"""Stream-stream interval join — the live twin of the batch
``asof.range_window_join`` pair generation that feeds
``clicks_before_purchase``.

This is the one Structured Streaming operator class the section lacked:
a watermarked STREAM-STREAM join (Spark's ad-monetization pattern —
both sides are unbounded, the time-range condition lets the engine
bound the join state and the watermarks let it EVICT: a buffered click
can be dropped once the purchase-side watermark passes
``click_ts + window``, so state stays proportional to the window, not
the stream).

Semantics are pinned to the batch twin exactly: one output row per
(purchase, click) pair of the same user with
``click_ts ∈ (purchase_ts − window, purchase_ts]`` — the
``range_window_join`` bounds (strict lower, inclusive upper). The
batch operator additionally keeps zero-click purchases via its
left-join recovery; a stream-stream INNER join cannot (an unmatched
purchase is only known unmatched once the watermark closes its window —
Spark supports that as a stream-stream LEFT join, emitting the NULL row
late), so the parity contract tested is: drained inner-join pairs ==
batch pairs, and the per-purchase aggregate == the batch aggregate
restricted to purchases with ≥1 click.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Watermark delay for both sides. The testdata streams replay history
#: file-by-file with no ordering guarantee across micro-batches, so the
#: delay must cover the full replay skew; production tunes this to the
#: real out-of-orderness (state size scales with it).
ATTRIBUTION_WATERMARK = "365 days"


def click_purchase_pairs_stream(
    events_stream: DataFrame,
    window_minutes: int = 30,
    join_type: str = "inner",
    watermark: str = ATTRIBUTION_WATERMARK,
) -> DataFrame:
    """Watermarked stream-stream join: every (purchase, click) pair of
    the same user with the click inside the purchase's preceding
    ``window_minutes`` — the pair stream ``clicks_before_purchase``
    aggregates in batch.

    Scale: the equi key (user_id) carries the shuffle on BOTH streams;
    the range condition is the join's state-eviction bound. No
    cartesian, no unbounded state: each side buffers at most
    watermark+window of rows per key.

    ``join_type="left_outer"`` keeps zero-click purchases — Spark
    emits their all-NULL click row only once the GLOBAL watermark
    (the MIN across both watermarked inputs, the default multi-stream
    policy) passes the purchase's window, so late emission is
    watermark-driven; tested with a controlled two-batch stream whose
    second batch carries far-future events on BOTH sides (a future
    purchase alone leaves the click side — and thus the global
    watermark — stuck, and the NULL row unemitted).
    ``watermark`` overrides the delay on both sides (tests use a tight
    one; the default covers the testdata replay skew).
    """
    clicks = (
        events_stream.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_event_id"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events_stream.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_event_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (
            F.col("click_ts")
            > F.col("purchase_ts")
            - F.expr(f"INTERVAL {window_minutes * 60} SECOND")
        )
        & (F.col("click_ts") <= F.col("purchase_ts")),
        join_type,
    ).select(
        "user_id",
        "purchase_event_id",
        "purchase_ts",
        "click_event_id",
        "click_ts",
        "click_value",
    )
