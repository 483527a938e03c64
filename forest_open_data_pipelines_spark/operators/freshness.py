"""Freshness / cadence classification over an observation stream.

Spark-first re-expression of ``src/forest_pipelines/freshness/
classifier.py:80-154``: per watch (≈ ``user_id`` in the events table),
compute the intervals between consecutive observations, take the
median and the coefficient of variation (population stddev / mean),
and classify the cadence and a confidence grade with the reference's
exact thresholds.

Scale notes: the lag window partitions by the watch key, so interval
computation is a single shuffle on user_id; everything after operates
on one row per watch. At 100 TB of events this is the canonical
sessionize-shaped plan (shuffle once, window within partition,
aggregate down).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from forest_open_data_pipelines_spark.functions.columns import ratio


def _intervals(events: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "ts",
        (
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
            / F.lit(86400.0 * 1_000_000)
        ).alias("interval_days"),
    )


def freshness_cadence(events: DataFrame) -> DataFrame:
    """Per-user cadence classification.

    Thresholds mirror classifier.py:116-154 (``_cadence_for`` /
    ``_confidence_for``): observations/changes counts, median interval,
    CV buckets → {daily, weekly, monthly, irregular, ad_hoc,
    insufficient_data} and confidence {low, medium, high}.
    Every event counts as an observation; positive intervals count as
    "changes" (the testdata has no unchanged-probe notion).
    """
    per_user = (
        _intervals(events)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("observations"),
            F.count(F.when(F.col("interval_days") > 0, 1)).alias("changes"),
            F.median(F.when(F.col("interval_days") > 0, F.col("interval_days"))).alias(
                "median_interval_days"
            ),
            F.stddev_pop(
                F.when(F.col("interval_days") > 0, F.col("interval_days"))
            ).alias("sd"),
            F.avg(F.when(F.col("interval_days") > 0, F.col("interval_days"))).alias(
                "mean_interval"
            ),
            F.max("ts").alias("last_observed_at"),
        )
    )
    cv = F.when(
        (F.col("changes") >= 2) & (F.col("mean_interval") != 0),
        F.col("sd") / F.col("mean_interval"),
    )
    cadence = (
        F.when((F.col("observations") >= 6) & (F.col("changes") < 2), F.lit("ad_hoc"))
        .when(F.col("changes") < 3, F.lit("insufficient_data"))
        .when(cv > 0.75, F.lit("irregular"))
        .when(
            (F.col("observations") >= 30) & (F.col("median_interval_days") <= 1.5),
            F.lit("daily"),
        )
        .when(
            (F.col("observations") >= 8)
            & (F.col("median_interval_days") >= 5)
            & (F.col("median_interval_days") <= 10),
            F.lit("weekly"),
        )
        .when(
            (F.col("median_interval_days") >= 25) & (F.col("median_interval_days") <= 35),
            F.lit("monthly"),
        )
        .otherwise(F.lit("irregular"))
    )
    confidence = (
        F.when((F.col("changes") < 3) | (F.col("observations") < 6), F.lit("low"))
        .when((F.col("observations") >= 30) & (cv.isNull() | (cv <= 0.25)), F.lit("high"))
        .when(cv.isNull() | (cv <= 0.75), F.lit("medium"))
        .otherwise(F.lit("low"))
    )
    return per_user.select(
        "user_id",
        "observations",
        "changes",
        ratio(F.col("median_interval_days")).alias("median_interval_days"),
        ratio(cv).alias("cv"),
        cadence.alias("suggested_cadence"),
        confidence.alias("confidence"),
        "last_observed_at",
    ).orderBy("user_id")


def freshness_latest(events: DataFrame) -> DataFrame:
    """Per-user last observation + staleness vs the global max timestamp
    (freshness/report.py analog: 'which watches are stale')."""
    per_user = events.groupBy("user_id").agg(
        F.max("ts").alias("last_observed_at"), F.count("*").alias("observations")
    )
    latest = per_user.agg(F.max("last_observed_at").alias("as_of"))
    return (
        per_user.join(F.broadcast(latest))
        .select(
            "user_id",
            "observations",
            "last_observed_at",
            ratio(
                (F.unix_micros("as_of") - F.unix_micros("last_observed_at"))
                / F.lit(86400.0 * 1_000_000)
            ).alias("staleness_days"),
        )
        .orderBy("user_id")
    )
