"""Same-session A/B for the round-12 curation_gate_matrix de-weak.

Times the shipped matrix (shared persisted staged-array scan) against
a faithful replica of the r11 shape (each repetition gate tokenizes
the corpus independently), plus the q1 floor for deflation. Throwaway
round tool — evidence lands in the round log.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from forest_open_data_pipelines_spark.operators import curation
from forest_open_data_pipelines_spark.operators.curation import (
    CURATION_MIN_QUALITY,
    CURATION_MIN_TOKENS,
    curation_gate_matrix,
    decontaminate_ngram,
    dsir_importance_weights,
    pii_scrub,
)
from forest_open_data_pipelines_spark.operators.dedup import release_persisted
from forest_open_data_pipelines_spark.operators.relational import q1_pricing_summary
from forest_open_data_pipelines_spark.operators.textops import (
    charlm_perplexity,
    gopher_repetition_rules,
    predicted_lang_col,
    quality_metric_cols,
    quality_repetition,
)
from forest_open_data_pipelines_spark.plans.catalog import load_table
from forest_open_data_pipelines_spark.session import get_spark
from forest_open_data_pipelines_spark.sources.tables import spread
from forest_open_data_pipelines_spark.functions.columns import ratio


def matrix_r11_shape(documents):
    n_tokens, _, _, score = quality_metric_cols()
    base = spread(documents).select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        ratio(score).alias("quality_score"),
        predicted_lang_col().alias("predicted_lang"),
    )
    rep = quality_repetition(documents).select("doc_id", "passes_repetition")
    rep_rules = gopher_repetition_rules(documents).select(
        "doc_id", "passes_repetition_rules"
    )
    lm = charlm_perplexity(documents).select(
        "doc_id", "entropy_bits", "passes_charlm"
    )
    pii = pii_scrub(documents, sorted_output=False).select("doc_id", "pii_free")
    dec = decontaminate_ngram(documents).select("doc_id", "contaminated")
    imp = dsir_importance_weights(documents).select(
        "doc_id", "log_importance", "target_like"
    )
    out = (
        base.join(rep, "doc_id")
        .join(rep_rules, "doc_id")
        .join(lm, "doc_id")
        .join(pii, "doc_id")
        .join(dec, "doc_id", "left")
        .join(imp, "doc_id")
    )
    passes_all = (
        (F.col("n_tokens") >= F.lit(CURATION_MIN_TOKENS))
        & (F.col("quality_score") >= F.lit(CURATION_MIN_QUALITY))
        & (F.col("predicted_lang") != "unknown")
        & F.col("passes_repetition")
        & F.col("passes_repetition_rules")
        & F.col("passes_charlm")
        & F.col("pii_free")
        & ~F.coalesce(F.col("contaminated"), F.lit(False))
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "quality_score",
        "predicted_lang",
        "passes_repetition",
        "passes_repetition_rules",
        "entropy_bits",
        "passes_charlm",
        "pii_free",
        "contaminated",
        "log_importance",
        "target_like",
        passes_all.alias("passes_all"),
    ).orderBy("doc_id")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    li = load_table(spark, sf_dir, "lineitem")

    def best(fn, reps=3):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().collect()
            times.append(time.perf_counter() - t0)
            release_persisted()
        return min(times)

    q1_pricing_summary(li).collect()  # warm the session
    floor = best(lambda: q1_pricing_summary(li))
    old = best(lambda: matrix_r11_shape(docs))
    new = best(lambda: curation_gate_matrix(docs))
    print(
        f"q1_floor_sec={floor:.3f} matrix_r11_shape={old:.3f}s "
        f"matrix_shared_scan={new:.3f}s ratio={new / old:.3f} "
        f"deflated_new={new / max(floor / 0.55, 1.0):.3f}s"
    )


if __name__ == "__main__":
    main()
