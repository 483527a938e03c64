"""Streaming front-end of the corpus-curation pipeline.

The incremental twin of ``operators.curation.corpus_curation``'s first
three stages: quality gate → language gate → content-fingerprint dedup
within a watermark. These are the stages an unbounded ingest CAN run
with bounded state (pure projections + ``dropDuplicatesWithinWatermark``);
the near-dup stage is pairwise over the surviving corpus and stays a
periodic batch compaction (``dedup_embedding_lsh`` over the
accumulated keeps) — exactly how production curation splits stream
vs. compaction.

Gate expressions are the batch operators' own column builders
(``textops.quality_metric_cols`` / ``predicted_lang_col``), so a record
passes the stream gate iff the batch pipeline would classify it past
the 'quality' and 'lang' stages — parity asserted in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from forest_open_data_pipelines_spark.functions.columns import ratio
from forest_open_data_pipelines_spark.operators.curation import (
    CURATION_MIN_QUALITY,
    CURATION_MIN_TOKENS,
)
from forest_open_data_pipelines_spark.operators.textops import (
    clean_text,
    predicted_lang_col,
    quality_metric_cols,
    repetition_row_cols,
)


def curation_gate_stream(
    documents_stream: DataFrame,
    watermark_col: str = "ts",
    watermark: str = "2 days",
    min_tokens: int = CURATION_MIN_TOKENS,
    min_quality: float = CURATION_MIN_QUALITY,
    with_repetition: bool = False,
) -> DataFrame:
    """Quality+language-gated, fingerprint-deduped document stream.

    Emits one record per content fingerprint whose FIRST-arriving copy
    passed every gate (state expires past the watermark — bounded no
    matter how long the stream runs). The quality compare runs on the
    6-dp-rounded score, identical to the batch pipeline's, so the two
    paths gate on the same boundary values.

    ``with_repetition=True`` adds the Gopher-style repetition gate via
    ``textops.repetition_row_cols`` — the stateless per-row twin of the
    batch ``quality_repetition`` aggregation, so a record passes the
    stream gate iff the batch operator marks it ``passes_repetition``
    (parity asserted in tests). Still ZERO extra state: the metrics
    fold in-codegen over each row's own token array.
    """
    n_tokens, _, _, score = quality_metric_cols()
    gated = (
        documents_stream.withColumn("n_tokens", n_tokens)
        .withColumn("quality_score", ratio(score))
        .withColumn("predicted_lang", predicted_lang_col())
        .where(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("quality_score") >= min_quality)
            & (F.col("predicted_lang") != "unknown")
        )
    )
    if with_repetition:
        gated = repetition_row_cols(gated).where(F.col("passes_repetition"))
    gated = gated.withColumn(
        "content_fingerprint", F.md5(F.lower(clean_text(F.col("text"))))
    )
    return (
        gated.withWatermark(watermark_col, watermark)
        .dropDuplicatesWithinWatermark(["content_fingerprint"])
        .select(
            "doc_id",
            "content_fingerprint",
            "n_tokens",
            "quality_score",
            "predicted_lang",
        )
    )
