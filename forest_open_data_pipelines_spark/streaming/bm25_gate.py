"""Streaming BM25 retrieval gate: the unbounded-ingest twin of
``operators.textops.bm25_route``.

The BM25 index (per-query-term idf micro-nats + the corpus average
document length) is FROZEN metadata from a static snapshot
(``collect_bm25_index`` — recomputing df inside the stream would let
arrival order change every verdict), and scoring is the same pure
per-row ``bm25_route_cols`` Catalyst folds as the batch twin — no
join, no watermark, ZERO streaming state, so stream output is
row-identical to the batch operator by construction (asserted in
tests).

This is the production "tag each arriving document with its
best-matching routing query" shape — retrieval-based routing of an
ingest firehose to per-topic curation queues, or decontamination
flagging against frozen eval-set queries, at queries·terms in-codegen
array scans per record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from forest_open_data_pipelines_spark.functions.columns import ratio
from forest_open_data_pipelines_spark.operators.textops import (
    bm25_route_cols,
    clean_text,
)


def bm25_route_stream(
    docs_stream: DataFrame,
    index: list[tuple[str, str, int]],
    avgdl: float,
) -> DataFrame:
    """Tag a stream of documents with the best frozen BM25 query.

    ``index``/``avgdl`` are ``collect_bm25_index``'s output. Emits the
    batch twin's exact columns (doc_id, best_query_id, best_bm25,
    n_queries_matched)."""
    toks = F.filter(
        F.split(F.lower(clean_text(F.col("text"))), " "), lambda x: x != ""
    )
    best_qid, best_micro, n_matched = bm25_route_cols(
        index, avgdl, F.col("t")
    )
    # two stacked projections, exactly the batch twin's plan: the
    # clean/split regex chain materializes the token array once per
    # record, the scoring folds read it
    return docs_stream.select("doc_id", toks.alias("t")).select(
        "doc_id",
        best_qid.alias("best_query_id"),
        ratio(best_micro.cast("double") / F.lit(1e6)).alias("best_bm25"),
        n_matched.alias("n_queries_matched"),
    )
