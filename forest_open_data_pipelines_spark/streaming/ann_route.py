"""Streaming ANN routing: the unbounded-ingest twin of
``operators.similarity.route_nearest_query``.

The frozen query set is index metadata (a bounded driver-side collect
from a STATIC snapshot — recomputing it inside the stream would change
every routing decision with arrival order), and the scoring expressions
are pure per-row Catalyst folds over literal vectors — no join, no
watermark, ZERO streaming state. The same ``route_score_cols``
expressions serve the batch operator, so stream output is row-identical
to the batch twin by construction (asserted in tests).

This is the production "tag each arriving document/embedding with its
nearest known cluster and whether it matches any routing probe" shape:
at 100 TB-scale ingest the per-record cost is n_queries sequential
64-step folds, fully inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from forest_open_data_pipelines_spark.operators.similarity import (
    ROUTE_THRESHOLD_MICRO,
    route_cols_from_scores,
    route_scores_array,
)


def ann_route_stream(
    embeddings_stream: DataFrame,
    queries: list[tuple[int, list[float], float]],
    threshold_micro: int = ROUTE_THRESHOLD_MICRO,
) -> DataFrame:
    """Route a stream of embeddings to the nearest frozen query.

    ``queries`` is ``similarity.collect_route_queries``' output
    (query_id, embedding, norm). Emits the batch twin's exact columns;
    query-set members arriving in the stream are passed through tagged
    ``is_query_vector`` instead of silently dropped (a stream cannot
    re-derive the batch twin's ``vec_id >= n_queries`` cut when ids are
    not monotonic, so the gate is explicit). Two stacked projections —
    the micro-cosine array materializes once, then argmax/count read
    it — exactly the batch plan.
    """
    qids = [q[0] for q in queries]
    best_id, best_cm, n_above = route_cols_from_scores(
        queries, F.col("cms"), threshold_micro
    )
    scored = embeddings_stream.select(
        "vec_id",
        route_scores_array(queries, F.col("embedding")).alias("cms"),
    )
    return scored.select(
        "vec_id",
        best_id.alias("best_query_id"),
        (best_cm.cast("double") / 1e6).alias("best_cosine"),
        n_above.alias("n_above_threshold"),
        F.col("vec_id").isin(qids).alias("is_query_vector"),
    )
