"""Streaming deduplication within a watermark.

The LLM-pipeline twin of batch ``dedup_exact``: a document/event stream
where upstream retries and replays produce duplicate records. Spark's
``dropDuplicatesWithinWatermark`` keeps one row per key and expires the
key state once the watermark passes it — bounded state no matter how
long the stream runs, which is what makes it viable on an unbounded
100 TB/day ingest (an unwatermarked dropDuplicates would grow state
forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    events_stream: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 days",
) -> DataFrame:
    """Drop duplicate records per key within the watermark horizon.

    ``keys`` defaults to the natural record identity (event_id). The
    watermark promises "no duplicate arrives more than `watermark`
    after the first copy", letting the state store evict old keys.
    """
    return events_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def dedup_content_stream(
    documents_stream: DataFrame, watermark_col: str = "ts", watermark: str = "2 days"
) -> DataFrame:
    """Content-hash streaming dedup: normalize + md5 the payload and
    keep the first record per fingerprint (exact-dedup semantics of
    ``operators.dedup.dedup_exact``, incrementally)."""
    from forest_open_data_pipelines_spark.operators.textops import clean_text

    fp = F.md5(F.lower(clean_text(F.col("text"))))
    return (
        documents_stream.withColumn("content_fingerprint", fp)
        .withWatermark(watermark_col, watermark)
        .dropDuplicatesWithinWatermark(["content_fingerprint"])
    )


def media_dedup_stream(
    media_stream: DataFrame, watermark_col: str = "ts", watermark: str = "2 days"
) -> DataFrame:
    """Content-addressed MEDIA streaming dedup: sha2-256 the binary
    payload (the same digest identity ``operators.multimodal.
    multimodal_dedup`` keys its batch table on) and keep the first
    record per digest within the watermark horizon — the dedup-on-
    ingest gate of a media lake, where re-crawls and mirror overlaps
    deliver byte-identical blobs days apart.

    The digest is computed BEFORE the stateful operator, so state
    stores 32 bytes per key, never the payload; bounded by the
    watermark like the text twin above.
    """
    return (
        media_stream.withColumn("sha256", F.sha2("payload", 256))
        .withWatermark(watermark_col, watermark)
        .dropDuplicatesWithinWatermark(["sha256"])
    )
