"""Approximate-nearest-neighbor similarity search over embeddings.

SURVEY.md §2.F. Two tiers:
- ``ann_topk_bruteforce``: exact cosine top-k of every query vector —
  the correctness baseline (oracle-checkable). The query set is tiny
  and broadcast, so the plan is a single scan of the candidate side:
  this is exactly how a 100 TB "score every document against K probes"
  job should look (no shuffle of the big side at all; top-k via
  per-partition partial ranking then a small final sort).
- ``ann_topk_lsh``: deterministic random-hyperplane LSH — candidates
  only from matching signature buckets, trading recall for a
  bucket-bounded join. Recall vs the baseline is asserted in tests.

Vector math uses Catalyst array lambdas (zip_with/aggregate), not
Python UDFs — it compiles to JVM codegen.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from forest_open_data_pipelines_spark.functions.columns import ratio


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x))


def ann_topk_bruteforce(
    embeddings: DataFrame, n_queries: int = 8, k: int = 10
) -> DataFrame:
    """Exact cosine top-k: queries = vec_id < n_queries, candidates =
    all other vectors. Ranking on the rounded similarity with vec_id
    tie-break keeps the result deterministic across engines."""
    queries = F.broadcast(
        embeddings.where(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            _norm(F.col("embedding")).alias("q_norm"),
        )
    )
    # Norm computed BEFORE the join: one pass per candidate row, carried
    # through the n_queries-way fan-out instead of recomputed per pair.
    cand = embeddings.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_norm"),
    )
    cos = ratio(
        _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm"))
    )
    scored = (
        cand.join(queries)
        .where(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cos.alias("cosine"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes derived from md5 of
    (plane, dim) — reproducible on any engine/runtime, no RNG state."""
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"plane{p}#{i}".encode()).hexdigest()
            row.append((int(h[:15], 16) % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def lsh_signature(emb: Column, planes: list[list[float]]) -> Column:
    """Bit-packed sign signature of the projections onto the planes."""
    sig = F.lit(0)
    for j, plane in enumerate(planes):
        proj = _dot(emb, F.array(*[F.lit(w) for w in plane]))
        sig = sig + F.when(proj > 0, F.lit(1 << j)).otherwise(0)
    return sig


# ANN LSH band geometry: 2 planes per band (16/8) keeps per-band match
# probability high enough for strong top-k recall on the low-cosine
# synthetic corpus (avg recall 0.95 vs bruteforce at sf0.001, asserted
# in tests) while the 8-band OR keeps buckets bounded. Shared with the
# DuckDB oracle generator in __spark_entry__.py.
ANN_LSH_PLANES = 16
ANN_LSH_BANDS = 8


def banded_signatures(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    n_planes: int,
    bands: int,
    dim: int = 64,
    carry_embedding: bool = False,
) -> DataFrame:
    """(id, band, key) hyperplane band signatures via ONE Arrow-batched
    numpy pass (optionally carrying the embedding + its norm through).

    The per-plane projection in Catalyst (``lsh_signature``) is an
    interpreted 64-step fold per plane per row — at 32 planes that is
    ~6k expression evaluations per vector and dominated the r3 bench
    numbers (measured: +2.6 s for 4× planes at sf0.1). Here the batch
    kernel accumulates the projections SEQUENTIALLY ACROSS DIMS
    (``acc += E[:, j] * P[:, j]``), the same left-to-right order as the
    Catalyst fold and the DuckDB oracle's ``list_sum`` comprehension, so
    every sign bit — and therefore every band key — is bit-identical to
    both (asserted in tests). Norms use the same sequential
    sum-of-squares so they bit-match ``_norm``'s fold.

    Scale: one streaming Arrow pass over the vectors, no shuffle; the
    output is ~20 bytes/row (or bands× the vector when
    ``carry_embedding`` — used only when the downstream join wants the
    vector without a second join against the source table).
    """
    import numpy as np

    planes = np.array(_hyperplanes(dim, n_planes), dtype=np.float64)
    per_band = n_planes // bands
    id_type = dict(df.dtypes)[id_col]
    extra = f", {emb_col} array<float>, nrm double" if carry_embedding else ""
    schema = f"{id_col} {id_type}, band int, key bigint{extra}"

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            e = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            n = len(pdf)
            acc = np.zeros((n, planes.shape[0]))
            nrm = np.zeros(n)
            for j in range(e.shape[1]):  # sequential over dims == fold order
                acc = acc + e[:, j, None] * planes[:, j]
                nrm = nrm + e[:, j] * e[:, j]
            bits = acc > 0
            keys = np.zeros((n, bands), dtype=np.int64)
            for b in range(bands):
                for j in range(per_band):
                    keys[:, b] += bits[:, b * per_band + j].astype(np.int64) << j
            out = {
                id_col: np.repeat(pdf[id_col].to_numpy(), bands),
                "band": np.tile(np.arange(bands, dtype=np.int32), n),
                "key": keys.reshape(-1),
            }
            if carry_embedding:
                out[emb_col] = np.repeat(pdf[emb_col].to_numpy(), bands)
                out["nrm"] = np.repeat(np.sqrt(nrm), bands)
            yield pd.DataFrame(out)

    return df.select(id_col, emb_col).mapInPandas(gen, schema)


def ann_topk_lsh(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    n_planes: int = ANN_LSH_PLANES,
    bands: int = ANN_LSH_BANDS,
    dim: int = 64,
) -> DataFrame:
    """LSH-bucketed top-k: score only candidates whose signature equals
    the query's in at least one plane band (OR-of-ANDs amplification:
    more bands → higher recall, more planes per band → smaller
    buckets; tune bands/planes to the corpus size instead of scanning
    everything).

    The candidate side is joined on the band key (equi-join on a
    bounded-cardinality bucket id, broadcast against the tiny banded
    query set) instead of broadcast-scoring everything — the shape that
    survives when the candidate side is huge.

    Scoring happens IN the bucket join (both sides carry their vector
    + norm out of the one-pass ``banded_signatures`` kernel), then a
    (query, cand) group-max deduplicates multi-band matches — one small
    shuffle of id pairs + cosines, and the big side is never shuffled
    at all (r2/r3 shape shuffled the candidate table twice: once for
    the pair distinct, once to re-attach embeddings). A pair matching
    in m bands pays its 64-dim dot m times; m ≤ bands and the dup rate
    is far below the cost of re-shuffling the corpus.
    """
    q_banded = F.broadcast(
        banded_signatures(
            embeddings.where(F.col("vec_id") < n_queries).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("q_emb"),
            ),
            "query_id",
            "q_emb",
            n_planes,
            bands,
            dim,
            carry_embedding=True,
        ).withColumnRenamed("nrm", "q_norm")
    )
    c_banded = banded_signatures(
        embeddings.select(
            F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
        ),
        "cand_id",
        "c_emb",
        n_planes,
        bands,
        dim,
        carry_embedding=True,
    ).withColumnRenamed("nrm", "c_norm")
    cos = ratio(
        _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm"))
    )
    scored = (
        c_banded.join(q_banded, ["band", "key"])
        .where(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cos.alias("cosine"))
        .groupBy("query_id", "cand_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def ann_topk_ivf(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-flat top-k: partition vectors into cells around deterministic
    seed centroids; score queries only against vectors in their
    ``n_probe`` nearest cells.

    Centroids are the first ``n_cells`` vectors (no k-means training —
    deterministic and oracle-reproducible) and are loaded ONCE at plan
    build as the IVF "trained model" — the standard index-metadata step;
    the bounded ``collect`` here is n_cells rows, not a data-scale
    action, and there is no ``count()`` in the query path.

    Cell assignment is a pure projection: each row computes its cosine
    against the centroid array literal and takes the argmax with
    ``array_max`` — NO join fan-out, NO shuffle between the scan and the
    assignment (the earlier shape, a 16× broadcast-join explosion argmin'd
    through a ``row_number`` window, re-shuffled the fanned table on
    vec_id). At 100 TB this is the inverted-file layout: the expensive
    top-k scan touches ``n_probe/n_cells`` of the data instead of all of
    it, and the cell map is exactly what a bucketed/partitioned-by-cell
    write would persist for reuse.
    """
    import math

    from pyspark.sql import Window

    cent_rows = sorted(
        embeddings.where(F.col("vec_id") < n_cells)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    if not cent_rows:
        # A non-contiguous vec_id space would otherwise degenerate the
        # centroid literal, NULL every cell assignment, and silently
        # return zero rows.
        raise ValueError(
            f"ann_topk_ivf: no rows with vec_id < n_cells={n_cells}; "
            "seed centroids require vec_ids starting at 0 (got none). "
            "Re-key the table or train centroids explicitly."
        )
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(int(r.vec_id)).alias("cell_id"),
                F.array(*[F.lit(float(x)) for x in r.embedding]).alias("cent_emb"),
                F.lit(
                    math.sqrt(sum(float(x) * float(x) for x in r.embedding))
                ).alias("cent_norm"),
            )
            for r in cent_rows
        ]
    )
    # Per-row scored cells: struct order (cell_cos, -cell_id) makes
    # lexicographic max = highest cosine, ties to the LOWEST cell id —
    # the same tie-break the window argmin used.
    cell_scored = F.transform(
        cent_arr,
        lambda c: F.struct(
            (
                _dot(F.col("embedding"), c["cent_emb"])
                / (F.col("v_norm") * c["cent_norm"])
            ).alias("cell_cos"),
            (-c["cell_id"]).alias("neg_cell_id"),
        ),
    )
    e = embeddings.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("v_norm")
    )
    cands = e.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        F.col("v_norm").alias("c_norm"),
        (-F.array_max(cell_scored)["neg_cell_id"]).alias("cell_id"),
    )
    # Queries probe their n_probe best cells: sort ascending, reverse →
    # descending by (cell_cos, neg_cell_id) = cos desc, cell_id asc.
    top_cells = F.slice(F.reverse(F.array_sort(cell_scored)), 1, n_probe)
    probes = (
        e.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("v_norm").alias("q_norm"),
            F.explode(top_cells).alias("pc"),
        )
        .select(
            "query_id", "q_emb", "q_norm", (-F.col("pc.neg_cell_id")).alias("cell_id")
        )
    )
    cos = ratio(
        _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm"))
    )
    # Each candidate lives in exactly one cell and a query's probe cells
    # are distinct, so (query_id, cand_id) pairs are already unique —
    # no distinct() shuffle needed before ranking.
    scored = (
        cands.join(F.broadcast(probes), "cell_id")
        .where(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
