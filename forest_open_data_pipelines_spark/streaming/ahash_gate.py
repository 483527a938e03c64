"""Streaming perceptual-dedup gate against a static aHash index — the
unbounded twin of ``operators.multimodal.media_ahash_incremental``.

The base side IS the index a production media pipeline persists: one
signed-64 aHash per asset (``multimodal.ahash_signatures``). An
arriving asset touches only that static index — block equi-join into
the index's key space, full ``bit_count(xor)`` verify, best-match
aggregation over its OWN candidates — so records never interact and
the correct streaming shape is the ``foreachBatch`` bridge (the
winnowing-gate precedent): every micro-batch runs the BATCH classifier
``classify_against_ahash_index``, verdict-identical by construction.

What this gate buys over the digest gate (streaming/dedup.py
first-per-digest): re-encoded/re-scaled copies of an already-ingested
asset keep their luma layout and land within a few hash bits, where
sha-256 sees a brand-new blob.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from forest_open_data_pipelines_spark.operators.multimodal import (
    classify_against_ahash_index,
)


def ahash_gate_stream(
    new_docs_stream: DataFrame,
    base_sigs: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint: str,
    **classify_kwargs,
) -> StreamingQuery:
    """foreachBatch bridge: classify each micro-batch against the
    static aHash index (``base_sigs`` from
    ``multimodal.ahash_signatures``, persisted by the caller) and hand
    the verdict frame to ``sink(df, batch_id)``. Idempotent under
    replay: verdicts are a pure function of (record, index)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # persist_new=False: a micro-batch is cheap to re-hash and a
        # per-batch registry persist would accumulate across the
        # stream (the winnowing-gate no-persists rationale).
        sink(
            classify_against_ahash_index(
                batch_df, base_sigs, persist_new=False, **classify_kwargs
            ),
            batch_id,
        )

    return (
        new_docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .start()
    )
