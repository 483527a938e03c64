"""Structured Streaming: windowed counts over the events stream must
equal the batch twin (``events_windowed``) once the stream drains."""

from __future__ import annotations

from forest_open_data_pipelines_spark.operators.sessionize import events_windowed
from forest_open_data_pipelines_spark.sources import load_table
from forest_open_data_pipelines_spark.streaming.windowed import (
    stream_events_from_parquet,
    windowed_counts_stream,
)
from tests.conftest import SF_DIR


def test_stream_matches_batch(spark, tmp_path):
    stream = stream_events_from_parquet(spark, SF_DIR)
    windowed = windowed_counts_stream(stream)
    query = (
        windowed.writeStream.format("memory")
        .queryName("windowed_counts_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        got = {
            (str(r["day"]), r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM windowed_counts_test").collect()
        }
    finally:
        query.stop()
    batch = {
        (str(r["day"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in events_windowed(load_table(spark, SF_DIR, "events")).collect()
    }
    assert got == batch


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
