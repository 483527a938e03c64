"""Streaming freshness-watch signal normalization: the unbounded-feed
twin of ``operators.freshness.freshness_watch_signals``.

A freshness watcher is the canonical streaming consumer — observations
(HTTP header probes, manifest fetches, page scrapes) arrive
continuously and each one normalizes INDEPENDENTLY (regex + integer
offset arithmetic, the precedence chain is per-record), so the batch
operator runs verbatim with zero state, no watermark, no shuffle: only
the batch side's presentation sort is dropped. Row-identical to batch
on a replayed feed (parity test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from forest_open_data_pipelines_spark.operators.freshness import (
    freshness_watch_signals,
)


def watch_signal_stream(observations_stream: DataFrame) -> DataFrame:
    """Normalize a stream of watch observations into freshness
    signals — the batch projection with ``sorted_output=False``."""
    return freshness_watch_signals(observations_stream, sorted_output=False)
