"""Multimodal column plumbing: image/audio/video as opaque `binary` payloads
with typed metadata, processed through Arrow-batched `mapInPandas`.

The decode libraries (PIL/librosa/ffmpeg) are NOT in this container, so the
actual pixel/sample decode is stubbed: `_decode_image` tries the real
library and otherwise computes a deterministic fake (length, md5 digest,
derived thumbnail dims). What IS real and tested end-to-end:

  * the schema contract (payload binary + media struct metadata),
  * the Arrow batch path (binary columns cross the JVM→Python boundary as
    zero-copy Arrow buffers; mapInPandas yields per-batch DataFrames),
  * partition-preserving feature extraction (no shuffle introduced),
  * the oracle-checkable feature subset (byte length, digest, dims).

At 100 TB the payloads dominate I/O: the media table should be stored with
payloads in their own parquet column chunk (large row groups, zstd), and any
metadata-only query must prune the payload column — which this module's
split of `media_metadata(df)` vs `extract_image_features(df)` guarantees
(Catalyst column pruning drops `payload` from the scan when unused).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("thumb_w", IntegerType()),
        StructField("thumb_h", IntegerType()),
    ]
)


def attach_image_payload(docs: DataFrame) -> DataFrame:
    """Simulate a media table from `documents`: payload = utf-8 bytes of the
    text (deterministic stand-in for encoded pixels), metadata struct with
    synthetic-but-deterministic dims. Prod: payload comes from the lake."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (F.pmod(F.col("doc_id") * F.lit(37), F.lit(512)) + F.lit(64)).cast("int").alias("width"),
            (F.pmod(F.col("doc_id") * F.lit(53), F.lit(512)) + F.lit(64)).cast("int").alias("height"),
            F.lit("image/png").alias("mime"),
        ).alias("media"),
    )


def _decode_image(payload: bytes, width: int, height: int):
    """Real decode when PIL exists; deterministic fake otherwise. The fake
    keeps the contract (bytes → (n_bytes, digest, thumb dims)) so the Spark
    plumbing is testable without the native library."""
    try:  # pragma: no cover - library absent in this container
        from PIL import Image  # noqa: F401

        raise NotImplementedError(
            "real decode path: Image.open(io.BytesIO(payload)).thumbnail(...)"
        )
    except ImportError:
        digest = hashlib.md5(payload).hexdigest()
        return len(payload), digest, max(width // 8, 1), max(height // 8, 1)


def extract_image_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one feature batch
    out; partition-preserving (no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, media_struct in zip(
                pdf["doc_id"], pdf["payload"], pdf["media"]
            ):
                n_bytes, digest, tw, th = _decode_image(
                    bytes(payload), media_struct["width"], media_struct["height"]
                )
                rows.append((doc_id, n_bytes, digest, tw, th))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "digest", "thumb_w", "thumb_h"]
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata-only projection — must NOT read the payload column (verify
    with .explain: ReadSchema excludes `payload`)."""
    return media.select("doc_id", "media.width", "media.height", "media.mime")


# --- video-ish frame sampling over the payload stand-in ----------------------


def sample_frames(docs: DataFrame, stride: int = 16) -> DataFrame:
    """Deterministic 'frame sampling' of a byte stream: every stride-th char
    code of the text stand-in, exploded to (doc_id, frame_idx, frame_code).
    Catalyst-only; models strided frame extraction without a video lib."""
    t = F.col("text")
    n = F.length(t)
    idxs = F.when(
        n >= 1,
        F.sequence(F.lit(1), F.greatest((n - F.lit(1)) / F.lit(stride) + F.lit(1), F.lit(1)).cast("int")),
    ).otherwise(F.array().cast("array<int>"))
    frames = F.transform(
        idxs, lambda i: F.ascii(t.substr((i - F.lit(1)) * F.lit(stride) + F.lit(1), F.lit(1)))
    )
    return docs.select(
        "doc_id", F.posexplode(frames).alias("frame_idx", "frame_code")
    )
