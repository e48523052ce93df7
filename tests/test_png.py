"""functions/png.py — the pure-stdlib codec behind the real G12 decode.

The round trip must be byte-true for every filter type (that exercises all
five unfilter paths), CRC corruption must be detected, and a hand-built
fixture (chunks + filtered scanlines assembled manually in the test, NOT
via encode_png) pins the decoder against the spec rather than against the
encoder's own conventions."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from email_address_parser_spark.functions.png import (
    PngError,
    decode_png,
    encode_png,
)


def _pattern(h, w, ch=None, seed=7):
    n = h * w * (ch or 1)
    arr = ((np.arange(n) * 13 + seed) % 256).astype(np.uint8)
    return arr.reshape((h, w) if ch is None else (h, w, ch))


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [None, 2, 3, 4])
def test_roundtrip_all_filters_all_colortypes(filter_type, ch):
    px = _pattern(5, 7, ch)
    w, h, decoded = decode_png(encode_png(px, filter_type=filter_type))
    assert (w, h) == (7, 5)
    assert np.array_equal(decoded, px)


def test_known_fixture_decodes_to_spec_pixels():
    # 2x2 greyscale, hand-assembled: row0 filter 0 (raw 10, 200), row1
    # filter 2 "up" with filtered bytes (b - up) & 0xFF for pixels (13, 199)
    scanlines = bytes([0, 10, 200]) + bytes([2, (13 - 10) & 0xFF, (199 - 200) & 0xFF])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )
    w, h, px = decode_png(png)
    assert (w, h) == (2, 2)
    assert px.tolist() == [[10, 200], [13, 199]]


def test_crc_corruption_detected():
    good = encode_png(_pattern(3, 3))
    bad = bytearray(good)
    bad[40] ^= 0xFF  # flip a byte inside IDAT payload
    with pytest.raises(PngError):
        decode_png(bytes(bad))
    # but skipping verification tolerates a *CRC-field* flip
    bad2 = bytearray(good)
    bad2[-5] ^= 0xFF  # last IEND CRC byte
    decode_png(bytes(bad2), verify_crc=False)


def test_malformed_inputs_raise():
    with pytest.raises(PngError):
        decode_png(b"not a png at all")
    # palette PNGs (color type 3) are out of scope and must say so
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(PngError):
        decode_png(png)


def test_decompression_bomb_is_bounded():
    # tiny IDAT that inflates far beyond the IHDR-implied size: the decoder
    # must cap the inflate at expected+1 bytes and raise, not materialize it
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # expects 6 bytes

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    bomb = zlib.compress(b"\x00" * 10_000_000)  # ~10 MB of zeros, ~10 KB deflated
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", bomb)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(PngError):
        decode_png(png)


def test_malformed_streams_raise_pngerror_not_stdlib_errors():
    """Every failure mode must surface as PngError (the multimodal feature
    extractor additionally catches broadly, but the codec's own contract is
    typed errors): zero IDAT, garbage deflate, truncated CRC, bad IHDR
    length, zero dimensions."""

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    cases = [
        sig + chunk(b"IHDR", ihdr) + chunk(b"IEND", b""),              # no IDAT
        sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", b"nota-deflate")   # bad zlib
        + chunk(b"IEND", b""),
        sig + chunk(b"IHDR", ihdr)[:20],                               # cut in CRC
        sig + chunk(b"IHDR", ihdr[:7]) + chunk(b"IEND", b""),          # short IHDR
        sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 0, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"")) + chunk(b"IEND", b""),    # w = 0
    ]
    for png in cases:
        with pytest.raises(PngError):
            decode_png(png)


def test_feature_extractor_survives_malformed_payload(spark):
    from pyspark.sql import Row

    from email_address_parser_spark.operators.multimodal import (
        extract_image_features,
    )

    media = spark.createDataFrame(
        [
            Row(doc_id=1, payload=bytearray(b"\x89PNG\r\n\x1a\ngarbage"),
                media=Row(width=8, height=8, mime="image/png")),
        ]
    )
    row = extract_image_features(media).collect()[0]
    assert row.decode_ok is False and row.width is None
