"""Streaming stratified sampling: the unbounded-ingest twin of
``operators.curation.stratified_sample``.

The keep predicate is a pure function of (doc_id, lang) given a rate
table — no RNG state, no watermark state — so the stream gate is a
stream-static broadcast join + filter. The rate table comes from a
STATIC corpus snapshot (``curation._mixture_rates`` over yesterday's
accumulated corpus): recomputing rates inside the stream would make
sampling probabilities drift with arrival order, which is exactly what
the deterministic md5 draw exists to prevent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from forest_open_data_pipelines_spark.operators.dedup import _md5_int


def stratified_sample_stream(
    documents_stream: DataFrame, rates: DataFrame
) -> DataFrame:
    """Gate a document stream by the mixture plan's allocation.

    ``rates`` must carry (lang, n_tokens, target_tokens) — the static
    table ``curation._mixture_rates`` produces. Emits the same columns
    as the batch ``stratified_sample``; a record passes iff the batch
    operator would keep it (exact integer predicate, parity asserted
    in tests). Zero streaming state.
    """
    u_micro = F.pmod(
        _md5_int(F.concat(F.lit("strat-"), F.col("doc_id").cast("string"))),
        F.lit(1000000),
    )
    return (
        documents_stream.select(
            "doc_id", "lang", "source", u_micro.alias("sample_u_micro")
        )
        .join(F.broadcast(rates.select("lang", "n_tokens", "target_tokens")), "lang")
        .where(
            F.col("sample_u_micro") * F.col("n_tokens")
            < F.col("target_tokens") * F.lit(1000000)
        )
        .select("doc_id", "lang", "source", "sample_u_micro")
    )
