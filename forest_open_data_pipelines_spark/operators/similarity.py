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


def ann_topk_lsh(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    n_planes: int = 8,
    bands: int = 4,
    dim: int = 64,
) -> DataFrame:
    """LSH-bucketed top-k: score only candidates whose signature equals
    the query's in at least one plane band (OR-of-ANDs amplification:
    more bands → higher recall, more planes per band → smaller
    buckets; tune bands/planes to the corpus size instead of scanning
    everything).

    The candidate side is joined on the band key (equi-join on a
    bounded-cardinality bucket id) instead of broadcast-scoring
    everything — the shape that survives when both sides are huge.

    Candidate (query, cand) id pairs are deduplicated BEFORE scoring:
    a pair matching in k of the bands would otherwise pay its 64-dim
    dot product k times. Ids dedup in a tiny shuffle; embeddings join
    back once per unique pair.
    """
    planes = _hyperplanes(dim, n_planes)
    per_band = n_planes // bands
    groups = [planes[b * per_band : (b + 1) * per_band] for b in range(bands)]

    def banded(df: DataFrame, id_col: str, emb_col: str, norm_col: str) -> DataFrame:
        # Norm + band signatures in one projection over the scan; the
        # explode fans out AFTER the per-row math so each plane
        # projection is computed once per vector, not once per band row.
        return df.select(
            F.col(id_col),
            F.col(emb_col),
            _norm(F.col(emb_col)).alias(norm_col),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            lsh_signature(F.col(emb_col), grp).alias("key"),
                        )
                        for b, grp in enumerate(groups)
                    ]
                )
            ).alias("b"),
        ).select(id_col, emb_col, norm_col, "b.band", "b.key")

    q_banded = F.broadcast(
        banded(
            embeddings.where(F.col("vec_id") < n_queries).select(
                F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
            ),
            "query_id",
            "q_emb",
            "q_norm",
        ).select("query_id", "band", "key")
    )
    c_banded = banded(
        embeddings.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")),
        "cand_id",
        "c_emb",
        "c_norm",
    ).select("cand_id", "band", "key")
    pairs = (
        c_banded.join(q_banded, ["band", "key"])
        .where(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    q_emb = F.broadcast(
        embeddings.where(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            _norm(F.col("embedding")).alias("q_norm"),
        )
    )
    c_emb = embeddings.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_norm"),
    )
    cos = ratio(
        _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm"))
    )
    scored = (
        pairs.join(c_emb, "cand_id")
        .join(q_emb, "query_id")
        .select("query_id", "cand_id", cos.alias("cosine"))
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
