"""Streaming winnowing gate against a static base fingerprint index —
the unbounded twin of ``operators.dedup.winnowing_incremental``.

The base side IS the index a production pipeline persists between
compactions: the non-hot (base_id, fingerprint) table plus the hot
stop-list (``dedup.build_winnowing_index``). Classifying an arriving
document touches only that static index, and the best-match step is a
per-record aggregation over its own candidates — records never
interact — so the correct streaming shape is the ``foreachBatch``
bridge (the incremental_dedup precedent): every micro-batch runs the
BATCH classifier ``classify_against_winnowing_index`` against the
index, verdict-identical by construction. A pure-streaming
formulation would smuggle the per-record aggregation into watermark
state for no benefit; candidates never cross micro-batches.

What the gate buys over the MinHash one: the winnowing detection
floor — any ≥ w+k−1-char verbatim run shared with the base corpus
contributes a fingerprint, so short verbatim lifts register even when
whole-document similarity is low.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from forest_open_data_pipelines_spark.operators.dedup import (
    classify_against_winnowing_index,
)


def winnowing_gate_stream(
    new_docs_stream: DataFrame,
    base_k: DataFrame,
    hot: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint: str,
    **classify_kwargs,
) -> StreamingQuery:
    """foreachBatch bridge: classify each micro-batch against the
    static winnowing index (``base_k``/``hot`` from
    ``dedup.build_winnowing_index``, persisted by the caller) and hand
    the verdict frame to ``sink(df, batch_id)``. Idempotent under
    replay: verdicts are a pure function of (record, index)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sink(
            classify_against_winnowing_index(
                batch_df, base_k, hot, **classify_kwargs
            ),
            batch_id,
        )

    return (
        new_docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .start()
    )
