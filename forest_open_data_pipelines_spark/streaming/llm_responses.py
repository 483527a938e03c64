"""Streaming LLM-response JSON gate.

The unbounded-ingest twin of ``operators.textops.parse_fenced_json``:
an LLM-generation pipeline emits responses continuously, and the
extraction/validation layer (llm/router.py:37 in the reference) is a
pure per-record computation — fence regex, brace fallback, the strict
brace-depth fold and the required-key check are all stateless Catalyst
projections, so the SAME operator runs on a stream with ZERO state and
no watermark requirement. Records classified 'ok' flow to downstream
consumers; rejects carry their status for a dead-letter sink.

Parity contract (tests/test_streaming.py): the drained stream's rows
equal batch ``parse_fenced_json`` on the same frame exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from forest_open_data_pipelines_spark.operators.textops import (
    JSON_REQUIRED_KEYS,
    parse_fenced_json,
)


def fenced_json_stream(
    responses_stream: DataFrame,
    required: tuple[str, ...] = JSON_REQUIRED_KEYS,
    valid_only: bool = False,
) -> DataFrame:
    """Per-record JSON extraction + validation over a response stream.

    ``valid_only=True`` keeps only status='ok' records (the
    feed-downstream shape); otherwise every record passes through with
    its status so rejects can route to a dead-letter sink via
    ``foreachBatch`` or a filtered second sink.
    """
    out = parse_fenced_json(responses_stream, required, sorted_output=False)
    return out.where(F.col("status") == "ok") if valid_only else out
