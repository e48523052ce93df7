"""Multimodal column plumbing: image/audio/video as opaque `binary` payloads
with typed metadata, processed through Arrow-batched `mapInPandas`.

Round 5: the image path is REAL end-to-end. Payloads are genuine PNG files
(encoded by the pure-stdlib codec in functions/png.py — zlib inflate/deflate
+ per-scanline filters, CRC-verified) and `extract_image_features` computes
its features from the ACTUAL decoded pixels: chunk parse → inflate →
unfilter → numpy array → checksums/luminance/thumbnail. Non-PNG mimes
(JPEG needs a DCT library this container lacks) remain an honest documented
stub that reports decode_ok=false instead of fake features.

What is tested end-to-end:

  * the schema contract (payload binary + media struct metadata),
  * the Arrow batch path (binary columns cross the JVM→Python boundary as
    Arrow buffers; mapInPandas yields per-batch DataFrames),
  * partition-preserving feature extraction (no shuffle introduced),
  * REAL decode: IHDR dims must equal the metadata struct, features derive
    from decoded pixel values (oracle-replayed in SQL from the
    deterministic pixel pattern — the codec round trip is what certifies
    "bytes on disk → same pixels"),
  * metadata-only queries prune the payload column from the scan.

At 100 TB the payloads dominate I/O: the media table should be stored with
payloads in their own parquet column chunk (large row groups, zstd), and any
metadata-only query must prune the payload column — which this module's
split of `media_metadata(df)` vs `extract_image_features(df)` guarantees
(Catalyst column pruning drops `payload` from the scan when unused).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from email_address_parser_spark.functions.png import decode_png, encode_png

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("decode_ok", BooleanType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("checksum", LongType()),
        StructField("mean_lum", IntegerType()),
        StructField("thumb_w", IntegerType()),
        StructField("thumb_h", IntegerType()),
        StructField("thumb_checksum", LongType()),
        StructField("digest", StringType()),
    ]
)

# deterministic synthetic-image law (shared by attach_image_payload, the
# mm_features oracle SQL, and the tests): a doc's greyscale image is
#   w = doc_id % 24 + 8,  h = (doc_id * 3) % 16 + 8,
#   pixel[i] = (doc_id * 7 + i * 13) % 256   (row-major i in 0..w*h-1)
# — every feature below is an integer function of these, so DuckDB replays
# the FEATURES exactly while Spark computes them from decoded PNG bytes;
# the byte-true codec round trip (tests/test_png.py) closes the gap
# between "replayed the pattern" and "decoded the file".


def _synth_dims(doc_id: int) -> tuple:
    return doc_id % 24 + 8, (doc_id * 3) % 16 + 8


def _synth_pixels(doc_id: int) -> np.ndarray:
    w, h = _synth_dims(doc_id)
    return (
        ((np.arange(w * h, dtype=np.int64) * 13 + doc_id * 7) % 256)
        .astype(np.uint8)
        .reshape(h, w)
    )


def attach_image_payload(docs: DataFrame) -> DataFrame:
    """Simulate a media table from `documents`: payload = a REAL encoded PNG
    of the deterministic pixel pattern above (filter type rotates with
    doc_id % 3 so stored files exercise several unfilter paths), metadata
    struct carrying the true dims. Prod: payload comes from the lake."""

    @F.pandas_udf(BinaryType())
    def _encode(doc_ids: pd.Series) -> pd.Series:
        return doc_ids.map(
            lambda d: encode_png(_synth_pixels(int(d)), filter_type=int(d) % 3)
        )

    return docs.select(
        "doc_id",
        _encode(F.col("doc_id")).alias("payload"),
        F.struct(
            (F.pmod(F.col("doc_id"), F.lit(24)) + F.lit(8))
            .cast("int")
            .alias("width"),
            (F.pmod(F.col("doc_id") * F.lit(3), F.lit(16)) + F.lit(8))
            .cast("int")
            .alias("height"),
            F.lit("image/png").alias("mime"),
        ).alias("media"),
    )


def _image_features(doc_id: int, payload: bytes, mime: str) -> tuple:
    """bytes → feature row. PNG is decoded for real; other mimes are the
    documented stub (no DCT library in-container): decode_ok=false, NULL
    features — callers see an explicit failure, never fake pixels."""
    if mime != "image/png":
        return (doc_id, False, None, None, None, None, None, None, None, None, None)
    try:
        w, h, px = decode_png(payload)
    except Exception:  # noqa: BLE001 — any malformed lake payload, not just
        # the codec's own PngError: a decode failure must become the
        # documented decode_ok=false row, never a task-killing exception
        return (doc_id, False, None, None, None, None, None, None, None, None, None)
    flat = px.reshape(-1).astype(np.int64)
    checksum = int(((np.arange(flat.size) + 1) * flat).sum())
    thumb = px[::8, ::8]
    return (
        doc_id,
        True,
        int(w),
        int(h),
        int(flat.size),
        checksum,
        int(flat.sum() // flat.size),
        int(thumb.shape[1]),
        int(thumb.shape[0]),
        int(thumb.astype(np.int64).sum()),
        hashlib.md5(px.tobytes()).hexdigest(),
    )


def extract_image_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one feature batch
    out; partition-preserving (no shuffle). Features come from REAL decoded
    pixels (functions/png.py)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _image_features(
                    int(doc_id), bytes(payload), media_struct["mime"]
                )
                for doc_id, payload, media_struct in zip(
                    pdf["doc_id"], pdf["payload"], pdf["media"]
                )
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

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
