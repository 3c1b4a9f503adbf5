"""Multimodal decode: real PNG/JPEG header parsing + the Arrow path.

The oracle parity suite covers the synthetic (fake-decode) corpus; these
tests pin the REAL decode path on handcrafted image bytes, which the
synthetic corpus never produces.
"""

from __future__ import annotations

import pytest

from spark_etl_pipeline_spark.operators.multimodal import (
    DECODED_SCHEMA,
    PAYLOAD_SCHEMA,
    _decode_fake,
    _decode_real,
    decode_features,
)


def png_bytes(width: int, height: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"  # signature
        + (13).to_bytes(4, "big")  # IHDR chunk length
        + b"IHDR"
        + width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00"  # bit depth, color type, etc.
        + b"\x00" * 16  # crc + fake payload tail
    )


def jpeg_bytes(width: int, height: int, sof_marker: int = 0xC0) -> bytes:
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof = (
        bytes([0xFF, sof_marker])
        + (17).to_bytes(2, "big")
        + b"\x08"  # precision
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + b"\x03" + b"\x00" * 9  # 3 components
    )
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def test_decode_real_parses_png_ihdr():
    assert _decode_real(png_bytes(640, 480)) == (640, 480)
    assert _decode_real(png_bytes(1, 99999)) == (1, 99999)


def test_decode_real_parses_jpeg_sof_variants():
    # baseline (SOF0), progressive (SOF2), arithmetic (SOF9)
    for marker in (0xC0, 0xC2, 0xC9):
        assert _decode_real(jpeg_bytes(1920, 1080, marker)) == (1920, 1080)


def test_decode_real_skips_fill_bytes_before_markers():
    # ITU T.81 B.1.1.2: markers may be preceded by any number of 0xFF
    # fill bytes. A padded-but-valid JPEG must decode EXACTLY (the old
    # walker read the pad byte as a marker and returned fake dims).
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof = (
        b"\xff\xff\xff"  # fill bytes before the SOF marker
        + b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + (480).to_bytes(2, "big")
        + (640).to_bytes(2, "big")
        + b"\x03" + b"\x00" * 9
    )
    padded = b"\xff\xd8" + b"\xff\xff" + app0 + sof + b"\xff\xd9"
    assert _decode_real(padded) == (640, 480)


def test_decode_real_treats_midstream_eoi_as_terminator():
    # EOI (0xD9) with trailing garbage must terminate the walk and raise
    # "no SOF", never be read as a length-prefixed segment.
    stream = b"\xff\xd8" + b"\xff\xd9" + b"\x7f" * 32
    with pytest.raises(ValueError):
        _decode_real(stream)
    # ... and a truncated SOF segment must raise, not IndexError.
    trunc = b"\xff\xd8" + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
    with pytest.raises(ValueError):
        _decode_real(trunc)


def test_decode_real_rejects_non_images():
    for junk in (b"", b"hello world", b"\xff\xd8 only soi", b"\x89PNGbad"):
        with pytest.raises(ValueError):
            _decode_real(junk)
    # DHT (0xC4) must be skipped, never read as a frame header
    dht = b"\xff\xd8" + b"\xff\xc4" + (4).to_bytes(2, "big") + b"\x00\x00"
    with pytest.raises(ValueError):
        _decode_real(dht)


def test_decode_features_uses_real_dimensions_for_real_images(spark):
    png = png_bytes(320, 200)
    jpg = jpeg_bytes(640, 360)
    txt = b"plain text payload"
    df = spark.createDataFrame(
        [(1, bytearray(png), "image/png"),
         (2, bytearray(jpg), "image/jpeg"),
         (3, bytearray(txt), "text/plain")],
        PAYLOAD_SCHEMA,
    )
    out = {r.doc_id: (r.width, r.height) for r in decode_features(df).collect()}
    assert out[1] == (320, 200)
    assert out[2] == (640, 360)
    assert out[3] == _decode_fake(txt)  # non-image falls back to the fake
    assert decode_features(df).schema == DECODED_SCHEMA
