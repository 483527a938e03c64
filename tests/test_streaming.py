"""Structured Streaming: windowed counts over the events stream must
equal the batch twin (``events_windowed``) once the stream drains."""

from __future__ import annotations

import pytest

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


def test_cadence_monitor_matches_batch(spark, tmp_path):
    """Stateful streaming cadence: after the stream drains, each user's
    cumulative (observations, changes, cv) must equal the batch
    freshness_cadence values (cv is mean-based in both)."""
    import pyspark.sql.functions as F

    from forest_open_data_pipelines_spark.operators.freshness import (
        freshness_cadence,
    )
    from forest_open_data_pipelines_spark.streaming.cadence import (
        cadence_monitor_stream,
    )

    stream = stream_events_from_parquet(spark, SF_DIR)
    monitored = cadence_monitor_stream(stream)
    query = (
        monitored.writeStream.format("memory")
        .queryName("cadence_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_cad"))
        .start()
    )
    try:
        query.processAllAvailable()
        # update mode appends one row per (user, batch); keep the last
        # (max observations) row per user.
        got = {
            r["user_id"]: r
            for r in spark.sql(
                """SELECT * FROM (
                     SELECT *, row_number() OVER (
                       PARTITION BY user_id ORDER BY observations DESC) AS rn
                     FROM cadence_test) WHERE rn = 1"""
            ).collect()
        }
    finally:
        query.stop()

    batch = {
        r["user_id"]: r
        for r in freshness_cadence(load_table(spark, SF_DIR, "events")).collect()
    }
    assert set(got) == set(batch)
    for uid, b in batch.items():
        g = got[uid]
        assert g["observations"] == b["observations"], uid
        assert g["changes"] == b["changes"], uid
        if b["cv"] is None:
            assert g["cv"] is None, uid
        else:
            assert g["cv"] == pytest.approx(b["cv"], abs=2e-6), uid
        assert g["last_observed_at"] == b["last_observed_at"], uid
