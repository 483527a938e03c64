"""Multimodal column plumbing: opaque binary payloads + typed metadata.

SURVEY.md §2.H. Real corpora carry image/audio/video as ``binary``
columns with a metadata struct; decode/resize/frame-sample run as
Arrow-batched pandas functions over ``mapInPandas``. The decode step
itself is STUBBED here (image/audio libs are not in this container):
``decode_real`` raises NotImplementedError, and the tested path uses a
deterministic fake decoder so the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and covered.

Scale notes: mapInPandas streams Arrow batches (no per-row Python
overhead); payload bytes never hit a shuffle — features are extracted
in the scan stage and only the small feature rows flow on.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", StructType(), True),  # documented; see as_media_table
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_mean", DoubleType(), True),
        StructField("byte_entropy_proxy", DoubleType(), True),
    ]
)


def decode_real(payload: bytes, media_type: str):
    """Real decoder (PIL/librosa/ffmpeg) — intentionally unavailable
    in this container."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; the tested path uses the deterministic fake decoder"
    )


def as_media_table(documents: DataFrame) -> DataFrame:
    """Project documents into the multimodal shape: opaque binary
    payload + typed metadata struct (the schema a real image/audio
    table would have)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/fake").alias("media_type"),
            F.col("n_chars").cast("long").alias("declared_size"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payloads via
    mapInPandas (deterministic fake decoder)."""

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                data = bytes(payload)
                n = len(data)
                mean = float(sum(data)) / n if n else None
                distinct = len(set(data))
                rows.append(
                    {
                        "media_id": int(media_id),
                        "media_type": meta["media_type"],
                        "n_bytes": n,
                        "byte_mean": round(mean, 6) if mean is not None else None,
                        "byte_entropy_proxy": round(distinct / 256.0, 6),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def multimodal_features(documents: DataFrame) -> DataFrame:
    """End-to-end plumbing query: documents → media table → features."""
    return extract_features(as_media_table(documents)).orderBy("media_id")
