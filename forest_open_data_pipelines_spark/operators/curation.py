"""End-to-end training-corpus curation pipeline.

The composition a user of this engine runs before LLM training:
quality gate → language gate → exact dedup → embedding near-dup drop,
with a per-document audit row naming the FIRST stage that rejected it.
Every stage reuses the first-class operators' expressions (textops
quality/lang heuristics, the dedup_exact fingerprint, the
dedup_embedding cosine), so the pipeline is the proof that the pieces
compose — reference parity for each piece is cited in its own module.

Scale: stages 1-3 are pure projections + one window over the
fingerprint key; the near-dup stage here is the EXACT all-pairs
cosine (the oracle baseline — auditable), and at corpus scale the
drop-in replacement is ``dedup.dedup_embedding_lsh``'s banded
candidates with identical verification (same threshold, same pair
rule). Documents without an embedding row skip the near-dup stage —
partial embedding coverage is the normal production state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from forest_open_data_pipelines_spark.operators.textops import (
    clean_text,
    lang_id,
    text_quality,
)

CURATION_MIN_TOKENS = 20
CURATION_MIN_QUALITY = 0.5
CURATION_COS_THRESHOLD = 0.45


def corpus_curation(
    documents: DataFrame,
    embeddings: DataFrame,
    min_tokens: int = CURATION_MIN_TOKENS,
    min_quality: float = CURATION_MIN_QUALITY,
    cos_threshold: float = CURATION_COS_THRESHOLD,
) -> DataFrame:
    """Per-document curation audit: (doc_id, n_tokens, quality_score,
    predicted_lang, content_fingerprint, status) where status is the
    first failing stage — 'quality', 'lang', 'exact_dup', 'near_dup' —
    or 'kept'.

    Stage semantics:
    - quality: n_tokens ≥ min_tokens AND quality_score ≥ min_quality
      (textops.text_quality's composite score).
    - lang: the marker-word language ID must recognize the document
      (predicted_lang ≠ 'unknown').
    - exact_dup: among quality+lang survivors, one canonical (min
      doc_id) per normalized-content md5 fingerprint survives
      (dedup.dedup_exact's keep-min rule as a window).
    - near_dup: among exact-stage survivors that HAVE an embedding
      (doc_id = vec_id), cosine ≥ cos_threshold pairs drop the higher
      doc_id (greedy pair rule, matching dedup_embedding's pair
      orientation).
    """
    q = text_quality(documents).select("doc_id", "n_tokens", "quality_score")
    lang = lang_id(documents).select("doc_id", "predicted_lang")
    fp = documents.select(
        "doc_id",
        F.md5(F.lower(clean_text(F.col("text")))).alias("content_fingerprint"),
    )
    base = (
        q.join(lang, "doc_id")
        .join(fp, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "quality_score",
            "predicted_lang",
            "content_fingerprint",
            (
                (F.col("n_tokens") >= min_tokens)
                & (F.col("quality_score") >= min_quality)
            ).alias("quality_ok"),
            (F.col("predicted_lang") != "unknown").alias("lang_ok"),
        )
    )
    surv = F.col("quality_ok") & F.col("lang_ok")
    canonical = F.min(F.when(surv, F.col("doc_id"))).over(
        Window.partitionBy("content_fingerprint")
    )
    base = base.withColumn("canonical_doc_id", canonical)
    exact_ok = surv & (F.col("doc_id") == F.col("canonical_doc_id"))

    norm = F.sqrt(
        F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x.cast("double") * x)
    )
    emb = embeddings.select(
        F.col("vec_id").alias("doc_id"), "embedding", norm.alias("norm")
    )
    pool = base.where(exact_ok).select("doc_id").join(emb, "doc_id")
    a = pool.select(
        F.col("doc_id").alias("doc_a"),
        F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"),
    )
    b = pool.select(
        F.col("doc_id").alias("doc_b"),
        F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"),
    )
    dot = F.aggregate(
        F.zip_with("emb_a", "emb_b", lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    near_ids = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        # 6-dp-rounded cosine before the threshold compare — the same
        # ratio() rounding dedup_embedding applies, so the pair set
        # (and the oracle) can't flip on summation-order ulp drift
        .where(F.round(dot / (F.col("norm_a") * F.col("norm_b")), 6) >= cos_threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_near_dup", F.lit(True))
    )
    status = (
        F.when(~F.col("quality_ok"), F.lit("quality"))
        .when(~F.col("lang_ok"), F.lit("lang"))
        .when(F.col("doc_id") != F.col("canonical_doc_id"), F.lit("exact_dup"))
        .when(F.coalesce(F.col("is_near_dup"), F.lit(False)), F.lit("near_dup"))
        .otherwise(F.lit("kept"))
    )
    return (
        base.join(near_ids, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "quality_score",
            "predicted_lang",
            "content_fingerprint",
            status.alias("status"),
        )
        .orderBy("doc_id")
    )
