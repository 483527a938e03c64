"""Streaming entity-resolution ingest gate — the unbounded twin of
``operators.entities.er_incremental_classify``.

The canonical index is exactly what a production record-linkage
pipeline persists between compactions: the keyed canonical records
(block_key, rec_id, entity_id, name).  Classifying an arriving record
touches only that static index, and the best-match step is a
per-record aggregation over its own candidates — records never
interact — so the correct streaming shape is the ``foreachBatch``
bridge (the ``incremental_dedup`` adjudication): every micro-batch
runs the BATCH classifier ``er_classify_against_index`` against the
index, verdict-identical by construction.  A stateful formulation
would smuggle a per-record aggregation into watermark state for no
benefit; candidates never cross micro-batches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.entities import ER_MAX_EDIT, er_classify_against_index


def er_gate_stream(
    records_stream: DataFrame,
    index: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint: str,
    max_edit: int = ER_MAX_EDIT,
) -> StreamingQuery:
    """foreachBatch bridge: classify each micro-batch of keyed
    records against the static canonical index and hand the verdict
    frame to ``sink(df, batch_id)``.  Idempotent under replay:
    verdicts are a pure function of (record, index)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sink(er_classify_against_index(batch_df, index, max_edit), batch_id)

    return (
        records_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .start()
    )
