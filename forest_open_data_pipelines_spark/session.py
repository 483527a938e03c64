"""SparkSession factory tuned for the workloads in this engine.

Local testing runs on ``local[N]``; the same configs are the ones we
would ship to a 1000-executor cluster (AQE, skew-join handling, Arrow
for the few pandas-UDF paths). Shuffle partitions default low for local
runs but AQE coalesces/splits at runtime, so the same code scales.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "forest-open-data-pipelines-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime coalescing of shuffle partitions, skew-join
        # splitting, and dynamic join-strategy switching. This is the
        # main lever that lets one config serve sf0.001 and 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        # Arrow for the pandas-UDF paths (multimodal stubs) and for
        # any toPandas in tests/bench.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Small dims (region/nation/query vectors) must broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.session.timeZone", "UTC")
        # The events source carries TIMESTAMP(NANOS) parquet columns,
        # which Spark has no native type for; read them as long and the
        # source layer converts to microsecond timestamps (same
        # truncation DuckDB applies).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Incremental per-year cache refresh (sinks.write_incremental_by_year)
        # must replace only the partitions present in the write.
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Managed-table storage (bucketed tables) out of the repo tree.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"),
        )
        .config(
            "spark.driver.extraJavaOptions",
            "-Dderby.system.home=/tmp/spark-graft-derby",
        )
    )
    return builder.getOrCreate()
