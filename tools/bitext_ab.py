"""Same-session alternating A/B for the bitext_mining candidate shape.

A = shipped (distinct-then-verify: id-only band join, one cosine fold
per distinct pair). B = r11 shape replica (carry_embedding band join,
cosine fold per band collision, max() dedupe). Both run the full
downstream margin/mutual-best pipeline. Throwaway round tool.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from forest_open_data_pipelines_spark.functions.columns import ratio
from forest_open_data_pipelines_spark.operators.dedup import (
    _persist,
    release_persisted,
)
from forest_open_data_pipelines_spark.operators.relational import (
    q1_pricing_summary,
)
from forest_open_data_pipelines_spark.operators.similarity import (
    ANN_LSH_BANDS,
    ANN_LSH_PLANES,
    BITEXT_KNN,
    BITEXT_MARGIN,
    _dot,
    _norm,
    banded_signatures,
    bitext_mining,
)
from forest_open_data_pipelines_spark.plans.catalog import load_table
from forest_open_data_pipelines_spark.session import get_spark


def bitext_r11_shape(documents, embeddings):
    src_lang, tgt_lang, k, margin_threshold = "en", "es", BITEXT_KNN, BITEXT_MARGIN
    n_planes, bands, dim = ANN_LSH_PLANES, ANN_LSH_BANDS, 64
    langs = documents.select(F.col("doc_id").alias("vec_id"), "lang")
    tagged = embeddings.join(langs, "vec_id")
    src = tagged.where(F.col("lang") == src_lang).select(
        F.col("vec_id").alias("src_id"), F.col("embedding").alias("s_emb")
    )
    tgt = tagged.where(F.col("lang") == tgt_lang).select(
        F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("t_emb")
    )
    sb = banded_signatures(
        src, "src_id", "s_emb", n_planes, bands, dim, carry_embedding=True
    ).withColumnRenamed("nrm", "s_norm")
    tb = banded_signatures(
        tgt, "tgt_id", "t_emb", n_planes, bands, dim, carry_embedding=True
    ).withColumnRenamed("nrm", "t_norm")
    cos = ratio(
        _dot(F.col("s_emb"), F.col("t_emb"))
        / (F.col("s_norm") * F.col("t_norm"))
    )
    pairs = _persist(
        sb.join(tb, ["band", "key"])
        .select("src_id", "tgt_id", cos.alias("cosine"))
        .groupBy("src_id", "tgt_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    micro = F.round(F.col("cosine") * 1e6, 0).cast("long")
    w_src = Window.partitionBy("src_id").orderBy(F.desc("cosine"), F.asc("tgt_id"))
    w_tgt = Window.partitionBy("tgt_id").orderBy(F.desc("cosine"), F.asc("src_id"))
    knn_src = (
        pairs.withColumn("r", F.row_number().over(w_src))
        .where(F.col("r") <= k)
        .groupBy("src_id")
        .agg(F.round(F.avg(micro), 0).cast("long").alias("src_knn_micro"))
    )
    knn_tgt = (
        pairs.withColumn("r", F.row_number().over(w_tgt))
        .where(F.col("r") <= k)
        .groupBy("tgt_id")
        .agg(F.round(F.avg(micro), 0).cast("long").alias("tgt_knn_micro"))
    )
    den = (
        (F.col("src_knn_micro") + F.col("tgt_knn_micro")).cast("double")
        / 2.0
        / 1e6
    )
    margin = ratio(F.col("cosine") / F.nullif(den, F.lit(0.0)))
    scored = _persist(
        pairs.join(knn_src, "src_id")
        .join(knn_tgt, "tgt_id")
        .select("src_id", "tgt_id", "cosine", margin.alias("margin"))
    )
    m_src = Window.partitionBy("src_id").orderBy(F.desc("margin"), F.asc("tgt_id"))
    m_tgt = Window.partitionBy("tgt_id").orderBy(F.desc("margin"), F.asc("src_id"))
    best = (
        scored.withColumn("sr", F.row_number().over(m_src))
        .withColumn("tr", F.row_number().over(m_tgt))
        .where(
            (F.col("sr") == 1)
            & (F.col("tr") == 1)
            & (F.col("margin") >= margin_threshold)
        )
    )
    return best.select("src_id", "tgt_id", "cosine", "margin").orderBy("src_id")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    floor = []
    for _ in range(3):
        t0 = time.perf_counter()
        q1_pricing_summary(load_table(spark, sf_dir, "lineitem")).count()
        floor.append(round(time.perf_counter() - t0, 3))
    print(f"q1_floor: {min(floor)}s {floor}", flush=True)

    # value-identity check first
    a = bitext_mining(docs, emb).collect()
    release_persisted()
    b = bitext_r11_shape(docs, emb).collect()
    release_persisted()
    assert a == b, "shapes disagree!"
    print(f"value-identical: {len(a)} rows", flush=True)

    ta, tb = [], []
    for i in range(reps):
        t0 = time.perf_counter()
        bitext_mining(docs, emb).count()
        ta.append(round(time.perf_counter() - t0, 3))
        release_persisted()
        t0 = time.perf_counter()
        bitext_r11_shape(docs, emb).count()
        tb.append(round(time.perf_counter() - t0, 3))
        release_persisted()
    print(f"NEW (distinct-then-verify): min={min(ta)} samples={ta}", flush=True)
    print(f"OLD (score-in-band-join):   min={min(tb)} samples={tb}", flush=True)


if __name__ == "__main__":
    main()
