"""Parquet star-schema source.

Analog of the reference's resource ingestion layer
(``src/forest_pipelines/datasets/*``, ``profiling.py:427-478``): the
reference downloads CSV/Excel/JSON/zip resources and profiles them;
here the canonical storage format is parquet (columnar, splittable,
predicate-pushdown-friendly) and ingestion is ``spark.read`` so scans
get column pruning and filter pushdown from Catalyst for free.

At 100 TB the fact tables (lineitem/orders/events/documents/embeddings)
are many-file parquet directories; ``spark.read.parquet`` parallelizes
by row-group. Dimension tables (region/nation) stay tiny and are
broadcast at join time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # events.parquet stores ts as INT64 TIMESTAMP(NANOS), which vanilla
    # Spark rejects (PARQUET_TYPE_ILLEGAL). The legacy conf is
    # runtime-settable, so set it here rather than relying on the
    # session builder — queries must work on any caller's session.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # read-only conf on some deployments; reader may still cope
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    # The events file stores ts as TIMESTAMP(NANOS); with
    # spark.sql.legacy.parquet.nanosAsLong it surfaces as a long of
    # nanoseconds — convert to a microsecond timestamp (flooring, the
    # same truncation DuckDB applies when it reads nanos).
    ts_field = next((f for f in df.schema.fields if f.name == "ts"), None)
    if ts_field is not None and ts_field.dataType.typeName() == "long":
        # integer division — double division loses precision at
        # nanosecond epoch magnitudes (~1.7e18 > 2^53)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    picked = names or TABLES
    return {name: load_table(spark, sf_dir, name) for name in picked}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so operators can also be driven via spark.sql."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
