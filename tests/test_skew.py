"""Skew helpers: salted join / two-phase agg equivalence with the
plain implementations."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from forest_open_data_pipelines_spark.functions.skew import (
    salted_join,
    two_phase_agg,
)
from forest_open_data_pipelines_spark.sources import load_table


def test_salted_join_matches_plain_join(spark):
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_nationkey"
    )
    plain = orders.join(customer, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(
        orders, customer, key="o_custkey", salt_from="o_orderkey", n_salts=4
    ).select("o_orderkey", "c_name")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_spreads_hot_key(spark):
    # A pathological fact table: 90% of rows share one key.
    fact = spark.range(0, 10_000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
    )
    dim = spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    out = salted_join(fact, dim, key="k", salt_from="row_id", n_salts=8)
    plain = fact.join(dim, "k")
    assert out.count() == plain.count()
    # salts actually take >1 distinct value for the hot key
    n_salts_used = (
        fact.where(F.col("k") == 7)
        .select(F.pmod(F.hash(F.col("row_id")), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert n_salts_used > 1


def test_two_phase_agg_matches_plain_agg(spark):
    events = load_table(spark, SF_DIR, "events")
    plain = (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("mx"),
            F.min("value").alias("mn"),
        )
        .orderBy("event_type")
        .collect()
    )
    two = (
        two_phase_agg(
            events,
            key="event_type",
            salt_from="event_id",
            aggs={
                "n": (F.count("*"), "sum"),
                "total": (F.sum("value"), "sum"),
                "mx": (F.max("value"), "max"),
                "mn": (F.min("value"), "min"),
            },
        )
        .orderBy("event_type")
        .collect()
    )
    assert [r.event_type for r in plain] == [r.event_type for r in two]
    for p, t in zip(plain, two):
        assert p.n == t.n
        assert abs(p.total - t.total) < 1e-6
        assert p.mx == t.mx
        assert p.mn == t.mn
