"""Structured Streaming jobs (SURVEY.md §2.I).

The reference's freshness watcher polls sources on a schedule
(``freshness/watch.py``) — a micro-batch stream of observations. Here
that is a real Structured Streaming pipeline: readStream →
watermarked tumbling-window aggregation → sink. The batch twin
(``operators.sessionize.events_windowed``) shares the grouping so the
oracle validates the semantics once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts_stream(events_stream: DataFrame, watermark: str = "2 days") -> DataFrame:
    """Watermarked tumbling 1-day window counts per event_type.

    The watermark bounds state for late data: at 100 TB/day the state
    store only retains windows newer than (max event time - watermark).
    """
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").cast("date").alias("day"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_events_from_parquet(
    spark: SparkSession, sf_dir: str, schema=None, glob: str = "events.parquet"
) -> DataFrame:
    """readStream over the events parquet (one file = one micro-batch
    in tests via maxFilesPerTrigger)."""
    if schema is None:
        schema = spark.read.option("pathGlobFilter", glob).parquet(sf_dir).schema
    # The streaming file source requires a directory path; stream the
    # table directory and glob-filter to the events file(s).
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", glob)
        .parquet(sf_dir)
    )
    # Same TIMESTAMP(NANOS) handling as the batch source layer
    # (sources/tables.py): nanos surface as long → µs timestamp.
    ts_field = next((f for f in stream.schema.fields if f.name == "ts"), None)
    if ts_field is not None and ts_field.dataType.typeName() == "long":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_field is not None and ts_field.dataType.typeName() == "timestamp_ntz":
        # timestamp[us] parquet surfaces as TIMESTAMP_NTZ; watermarks
        # require TIMESTAMP. Retag timezone-independently (see
        # sources/tables.py ntz_as_utc_instant): a bare cast would
        # shift the instant on non-UTC caller sessions.
        from forest_open_data_pipelines_spark.sources.tables import (
            ntz_as_utc_instant,
        )

        stream = stream.withColumn("ts", ntz_as_utc_instant(spark, F.col("ts")))
    return stream


def stream_to_incremental_year_cache(
    events_stream, path: str, checkpoint: str, date_col: str = "ts"
):
    """Bridge an unbounded event stream into the per-year incremental
    parquet cache (the reference's ``bdqueimadas_incremental.py``
    per-year payload refresh, fed continuously instead of per sync
    run): each micro-batch rewrites ONLY the year partitions it
    touches, via ``foreachBatch`` + dynamic partition overwrite.

    Per micro-batch: compute the distinct years present (bounded —
    a batch spans few years), then delegate to the batch writer
    ``write_incremental_by_year`` with exactly those years. Restarts
    replay from the checkpoint; the per-year rewrite is idempotent, so
    at-least-once delivery converges to the batch result.

    NOTE: dynamic overwrite replaces each touched year partition with
    the BATCH's rows for that year — correct for the reference's
    payload-cache semantics where a refresh re-derives a whole year
    from upstream; for append-style feeds use write_partitioned with
    mode='append' instead.
    """
    from forest_open_data_pipelines_spark.sinks.writers import (
        write_incremental_by_year,
    )

    def _sink(batch_df, batch_id: int) -> None:
        years = [
            r["y"]
            for r in batch_df.select(
                F.year(F.col(date_col)).alias("y")
            ).distinct().collect()
        ]
        if years:
            write_incremental_by_year(batch_df, path, date_col, years=years)

    return (
        events_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )


def windowed_counts_by_nation(
    events_stream: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static enrichment + windowed aggregation: the event
    stream joins the STATIC customer→nation dimensions (broadcast — a
    stream-static equi-join never shuffles the stream side for a
    broadcastable dim) and counts per (window, nation) under a
    watermark. The canonical 'enrich the firehose with reference data'
    job; batch parity asserted in tests.
    """
    dims = customer.select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    ).join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("user_id", "n_name")
    return (
        events_stream.withWatermark("ts", watermark)
        .join(F.broadcast(dims), "user_id")
        .groupBy(F.window("ts", window).alias("w"), "n_name")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "n_name",
            "n_events",
        )
    )
