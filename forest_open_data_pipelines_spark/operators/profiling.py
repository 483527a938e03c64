"""Distributed dataset profiling, schema audit, and catalog rollups.

Spark-first analog of the reference's profiling and audit layers:
- ``src/forest_pipelines/profiling.py:269-318`` profiles one resource at
  a time (row/column counts, per-column samples) on a single machine;
  here one declarative aggregation profiles the whole table in a single
  distributed pass (map-side partial aggs, no per-file Python loop).
- ``src/forest_pipelines/audits/inpe/bdqueimadas_focos.py:60-210``
  computes column presence, modal schema and divergent files across
  yearly ZIPs; here the same semantics run over source-partitioned data
  with collect_set + a broadcast modal signature.
- ``src/forest_pipelines/catalog/build.py`` aggregates datasets per
  source agency; `catalog_summary` is that rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from forest_open_data_pipelines_spark.functions.columns import ratio


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column statistics: non-null count, nulls, exact distinct,
    min/max/mean (numeric columns only for min/max/mean).

    One wide aggregation computes every column's stats in a single scan
    (the reference re-reads the file per concern); the per-column rows
    are produced by unioning the already-aggregated scalars, so the
    fact table is read exactly once per stat family.
    """
    cols = columns or df.columns
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in {"integer", "long", "double", "float", "decimal"}
    }
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
        ]
        if c in numeric:
            aggs += [
                F.min(F.col(c)).cast("double").alias(f"{c}__min"),
                F.max(F.col(c)).cast("double").alias(f"{c}__max"),
                ratio(F.avg(F.col(c))).alias(f"{c}__mean"),
            ]
    wide = df.agg(*aggs)
    # Pivot the single wide row into one row per column via a stack expr
    # (pure Catalyst, no Python iteration over data).
    parts = []
    for c in cols:
        if c in numeric:
            parts.append(
                f"'{c}', `{c}__nn`, `{c}__nulls`, `{c}__distinct`, "
                f"`{c}__min`, `{c}__max`, `{c}__mean`"
            )
        else:
            parts.append(
                f"'{c}', `{c}__nn`, `{c}__nulls`, `{c}__distinct`, "
                f"cast(null as double), cast(null as double), cast(null as double)"
            )
    stack = (
        f"stack({len(cols)}, {', '.join(parts)}) as "
        "(column_name, non_null_count, null_count, distinct_count, min_value, max_value, mean_value)"
    )
    return wide.selectExpr(stack).orderBy("column_name")


def catalog_summary(documents: DataFrame) -> DataFrame:
    """Per-source catalog rollup (catalog/build.py analog): item count,
    distinct languages, size stats."""
    return (
        documents.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_chars").alias("total_chars"),
            ratio(F.avg("n_chars")).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source")
    )


def schema_audit(documents: DataFrame) -> DataFrame:
    """Per-source language-signature audit vs the modal signature.

    Reference semantics (audits/inpe/bdqueimadas_focos.py:129-154):
    compute each file's column list, find the modal schema, report each
    file's signature and whether it diverges. Here "file" ≈ source
    partition and "columns" ≈ the set of langs observed in it; the
    modal signature is the most frequent signature (ties broken
    lexicographically) attached via broadcast.
    """
    sigs = documents.groupBy("source").agg(
        F.array_join(F.array_sort(F.collect_set("lang")), ",").alias("signature"),
        F.count("*").alias("n_docs"),
    )
    modal = (
        sigs.groupBy("signature")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "signature")
        .limit(1)
        .select(F.col("signature").alias("modal_signature"))
    )
    return (
        sigs.join(F.broadcast(modal))
        .select(
            "source",
            "n_docs",
            "signature",
            "modal_signature",
            (F.col("signature") != F.col("modal_signature")).alias("diverges"),
        )
        .orderBy("source")
    )
