"""Streaming região rollup for the daily social card (SURVEY §2.I).

The reference's daily social pipeline re-downloads the day's detection
CSVs on a schedule and rebuilds the região rank card
(``social/bdqueimadas_daily/pipeline.py`` ``run``/``build_region_rank``)
— a polling micro-batch over an append-only feed. Here that is a real
Structured Streaming job: readStream over the detections feed →
normalized-state região lookup (the same in-codegen literal map the
batch ``region_rank`` operator uses — a pure projection, so it runs
inside the stream's stateless stage) → watermarked per-day região
counts.

The batch twin validates the semantics: with the rank window applied to
the drained totals, results are row-identical to
``operators.social.region_rank`` (tests/test_streaming.py).

Scale: the only stateful operator is the (day, região) count — ≤6
regions × retained days of state, bounded by the watermark regardless
of feed volume; the lookup adds no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from forest_open_data_pipelines_spark.operators.social import (
    STATE_REGION_BY_NAME,
    STATE_REGION_BY_UF,
    UNIDENTIFIED_REGION,
    normalize_state_label,
)


def region_counts_stream(
    detections_stream: DataFrame, watermark: str = "2 days"
) -> DataFrame:
    """Watermarked per-day detection counts per região.

    Input schema: (ts timestamp, estado string, ...). The watermark
    bounds the aggregation state for late detections (the reference's
    feed republishes same-day files); output is append-compatible once
    a day's watermark passes.
    """
    lookup = {**STATE_REGION_BY_UF, **STATE_REGION_BY_NAME}
    mapping = F.create_map(*[F.lit(x) for kv in sorted(lookup.items()) for x in kv])
    region = F.coalesce(
        mapping[normalize_state_label(F.col("estado"))],
        F.lit(UNIDENTIFIED_REGION),
    )
    return (
        detections_stream.withWatermark("ts", watermark)
        .select(F.col("ts"), region.alias("label"))
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("label"))
        .agg(F.count("*").alias("value"))
        .select(F.col("w.start").cast("date").alias("day"), "label", "value")
    )
