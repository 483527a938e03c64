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
