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
    BinaryType,
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
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                data = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = int(data.size)
                mean = float(data.mean()) if n else None
                distinct = int(np.unique(data).size)
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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("resized", BinaryType(), False),
        StructField("checksum", DoubleType(), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_index", LongType(), False),
        StructField("frame_bytes", LongType(), False),
        StructField("frame_mean", DoubleType(), True),
    ]
)


def resize_media(media: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Deterministic fake resize: payload bytes nearest-neighbor-sampled
    onto a width×height grid (a real implementation swaps the sampling
    line for PIL/ffmpeg — see ``decode_real``). Shows the 1→1 binary-in
    binary-out mapInPandas shape with typed output dims."""

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        target = width * height
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = np.frombuffer(bytes(payload), dtype=np.uint8)
                if data.size == 0:
                    out = np.zeros(target, dtype=np.uint8)
                else:
                    # nearest-neighbor index map — the deterministic
                    # stand-in for a real interpolation kernel
                    idx = (np.arange(target) * data.size) // target
                    out = data[idx]
                rows.append(
                    {
                        "media_id": int(media_id),
                        "width": width,
                        "height": height,
                        "resized": out.tobytes(),
                        "checksum": round(float(out.mean()), 6),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(_resize, RESIZED_SCHEMA)


def multimodal_resize(documents: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """End-to-end resize query: documents → media table → resized dims +
    checksum. The binary output column is dropped from the query result
    so the driver's rows-only collect stays light; the bytes themselves
    are covered by tests/test_multimodal.py."""
    return (
        resize_media(as_media_table(documents), width=width, height=height)
        .select("media_id", "width", "height", "checksum")
        .orderBy("media_id")
    )


def sample_frames(media: DataFrame, frame_size: int = 64, every_n: int = 4) -> DataFrame:
    """Frame sampling: treat the payload as a sequence of fixed-size
    frames and emit every ``every_n``-th one — the 1→N fan-out shape
    (video → sampled frames) where the expansion happens inside the
    Arrow batch, before anything shuffles."""

    def _frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = np.frombuffer(bytes(payload), dtype=np.uint8)
                n_frames = max(1, -(-data.size // frame_size)) if data.size else 0
                for fi in range(0, n_frames, every_n):
                    chunk = data[fi * frame_size : (fi + 1) * frame_size]
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "frame_index": fi,
                            "frame_bytes": int(chunk.size),
                            "frame_mean": round(float(chunk.mean()), 6)
                            if chunk.size
                            else None,
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(_frames, FRAME_SCHEMA)


def multimodal_frames(documents: DataFrame) -> DataFrame:
    """End-to-end frame-sampling query: documents → media → sampled
    frames (1→N inside Arrow batches)."""
    return sample_frames(as_media_table(documents)).orderBy("media_id", "frame_index")
