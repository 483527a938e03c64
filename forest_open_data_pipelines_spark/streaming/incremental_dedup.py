"""Streaming ingest dedup against a static base-corpus index — the
unbounded twin of ``operators.dedup.dedup_incremental``.

The base side of incremental dedup is exactly the INDEX a production
pipeline persists between compactions: the distinct content
fingerprints, the MinHash band signatures, and the shingle arrays of
the accumulated corpus. Classification of an arriving document touches
only that static index, and the best-match step is a per-record
aggregation over its own candidates — records never interact — so the
correct streaming shape is a ``foreachBatch`` bridge: every
micro-batch runs the BATCH classifier against the index (same code
path, verdict-identical by construction), exactly like the
``foreachBatch`` → incremental-year-cache bridge in ``sinks``.
A fully "pure" streaming formulation would smuggle the per-record
aggregation into watermark state for no benefit; candidates never
cross micro-batches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from forest_open_data_pipelines_spark.functions.columns import ratio
from forest_open_data_pipelines_spark.operators.dedup import (
    hashed_shingle_table,
    minhash_band_frame,
)
from forest_open_data_pipelines_spark.operators.textops import clean_text


def build_dedup_index(
    base_docs: DataFrame, num_hashes: int = 16, bands: int = 4, n: int = 3
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(fingerprints, band rows, shingle arrays) of the base corpus —
    the three static tables the per-batch classifier joins against.
    In production these are written at each compaction and read back;
    here they are returned as DataFrames the caller should persist."""
    norm = F.lower(clean_text(F.col("text")))
    fps = (
        base_docs.select(F.md5(norm).alias("content_fingerprint"))
        .distinct()
        .withColumn("exact_hit", F.lit(True))
    )
    sh = hashed_shingle_table(base_docs, n)
    bandrows = minhash_band_frame(sh, num_hashes, bands).withColumnRenamed(
        "doc_id", "base_id"
    )
    shingles = sh.select(
        F.col("doc_id").alias("base_id"), F.col("hashes").alias("sh_b")
    )
    return fps, bandrows, shingles


def classify_against_index(
    new_docs: DataFrame,
    fps: DataFrame,
    bandrows: DataFrame,
    shingles: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Batch classification of ``new_docs`` against a prebuilt index —
    verdict-identical to ``dedup.dedup_incremental(new, base)`` run
    against the index's source corpus (asserted in tests)."""
    from pyspark.sql import Window

    norm = F.lower(clean_text(F.col("text")))
    sh_new = hashed_shingle_table(new_docs, n)
    exact = new_docs.select(
        "doc_id", F.md5(norm).alias("content_fingerprint")
    ).join(F.broadcast(fps), "content_fingerprint", "left")
    bn = minhash_band_frame(sh_new, num_hashes, bands)
    cand = (
        bn.join(F.broadcast(bandrows), ["band_id", "band_hash"])
        .select("doc_id", "base_id")
        .distinct()
    )
    verified = (
        cand.join(sh_new.select("doc_id", F.col("hashes").alias("sh_n")), "doc_id")
        .join(F.broadcast(shingles), "base_id")
        .select(
            "doc_id",
            "base_id",
            ratio(
                F.size(F.array_intersect("sh_n", "sh_b"))
                / F.size(F.array_union("sh_n", "sh_b"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("jaccard"), "base_id")
    best = (
        verified.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("base_id").alias("matched_base_id"),
            F.col("jaccard").alias("best_jaccard"),
        )
    )
    status = (
        F.when(F.coalesce("exact_hit", F.lit(False)), F.lit("exact_dup"))
        .when(F.col("matched_base_id").isNotNull(), F.lit("near_dup"))
        .otherwise(F.lit("new"))
    )
    return (
        exact.join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("exact_hit", F.lit(False)).alias("exact_dup"),
            F.col("matched_base_id").isNotNull().alias("near_dup"),
            "matched_base_id",
            "best_jaccard",
            status.alias("status"),
        )
    )


def incremental_dedup_stream(
    new_docs_stream: DataFrame,
    fps: DataFrame,
    bandrows: DataFrame,
    shingles: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint: str,
    **classify_kwargs,
) -> StreamingQuery:
    """foreachBatch bridge: classify each micro-batch against the
    static index and hand the verdict frame to ``sink(df, batch_id)``.
    Idempotent under replay: verdicts are a pure function of
    (record, index)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sink(
            classify_against_index(
                batch_df, fps, bandrows, shingles, **classify_kwargs
            ),
            batch_id,
        )

    return (
        new_docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .start()
    )
