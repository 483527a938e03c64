"""Sequence packing: assign documents to fixed token-budget training
sequences — the batch-construction step of an LLM data pipeline (first-
class operator per the build brief; no reference counterpart).

Packing is inherently sequential WITHIN a stream (each placement
depends on the running fill), so the scalable shape is: pick a stream
key whose groups are bounded, shuffle once on that key, and run the
O(group) greedy kernel per stream. Here the stream key is
(source, doc_id % n_shards): at corpus scale raise ``n_shards`` so
each stream holds a bounded number of documents — packing quality is
per-stream greedy either way, and streams are independent, so the
fan-out is embarrassingly parallel after the single shuffle.

The greedy rule is first-fit-sequential in doc_id order: a document
joins the open sequence iff its tokens fit the remaining budget, else
it opens the next sequence. A document larger than the whole budget
still gets its own (overflowing) sequence — truncation is a separate
policy decision left to the caller.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from forest_open_data_pipelines_spark.operators.textops import clean_text

PACK_BUDGET = 256

_SCHEMA = (
    "source string, doc_id long, n_tokens long, seq_id long, offset_in_seq long"
)


def _pack_group(pdf: pd.DataFrame, budget: int) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    seq_ids = []
    offsets = []
    seq, fill = 0, 0
    for n in pdf["n_tokens"]:
        if fill > 0 and fill + n > budget:
            seq, fill = seq + 1, 0
        seq_ids.append(seq)
        offsets.append(fill)
        fill += n
    pdf["seq_id"] = seq_ids
    pdf["offset_in_seq"] = offsets
    return pdf[["source", "doc_id", "n_tokens", "seq_id", "offset_in_seq"]]


def pack_sequences(
    documents: DataFrame, budget: int = PACK_BUDGET, n_shards: int = 1
) -> DataFrame:
    """One row per document: its packed (seq_id, offset_in_seq) within
    its (source[, shard]) stream. ``seq_id`` numbers sequences within
    the stream from 0; ``offset_in_seq`` is the token offset where the
    document starts.

    Arrow-batched ``applyInPandas`` — the kernel is the canonical
    greedy packer, O(stream) with no lookback, so state is two ints.
    """
    toks = F.split(clean_text(F.col("text")), " ")
    sized = documents.select(
        "source", "doc_id", F.size(toks).cast("long").alias("n_tokens")
    )
    keys = ["source"]
    if n_shards > 1:
        sized = sized.withColumn("shard", F.col("doc_id") % n_shards)
        keys.append("shard")

    def gen(pdf: pd.DataFrame) -> pd.DataFrame:
        return _pack_group(pdf, budget)

    return (
        sized.groupBy(*keys)
        .applyInPandas(gen, _SCHEMA)
        .orderBy("doc_id")
    )
