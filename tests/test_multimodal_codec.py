"""Capability-gated media codec: real images decode through the same
mapInPandas path the stub uses.

The container may or may not ship PIL; the codec uses it when importable
and otherwise falls back to a stdlib header parser — either way these
tests decode ACTUAL image bytes (dimensions read from the file, not a
hash). Unknown formats fall back to the deterministic stub, auditable
via the ``codec`` column.
"""

from __future__ import annotations

import struct
import zlib

import pytest

import sierradb_spark.operators  # noqa: F401  (registry package first: multimodal imports operators.base, and a direct import would re-enter the package init mid-module)
from sierradb_spark.functions._media_codec import fake_decode, real_decode
from sierradb_spark.functions.multimodal import decode_media


def make_png(width: int, height: int, rgb=(200, 30, 30)) -> bytes:
    """A valid minimal PNG (8-bit RGB), stdlib-only."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    row = b"\x00" + bytes(rgb) * width  # filter byte 0 + pixels
    idat = zlib.compress(row * height)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int) -> bytes:
    """A valid minimal GIF89a (2-color, one black frame)."""
    header = b"GIF89a" + struct.pack("<HH", width, height) + b"\x80\x00\x00"
    palette = b"\x00\x00\x00\xff\xff\xff"
    img_desc = b"," + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    # LZW minimum code size 2; single clear+EOI block is enough of a body
    body = b"\x02\x02\x44\x01\x00"
    return header + palette + img_desc + body + b";"


def make_jpeg_header(width: int, height: int) -> bytes:
    """JPEG prefix through SOF0 — enough for dimension decode via the
    header parser (PIL needs a full scan, so this only feeds the
    non-PIL path assertions)."""
    soi = b"\xff\xd8"
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00\x48\x00\x48\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x01\x11\x00"
    )
    return soi + app0 + sof0


def test_real_decode_png_gif():
    w, h, c, codec = real_decode(make_png(37, 21))
    assert (w, h, c) == (37, 21, 3)
    assert codec in ("pil", "header")
    w, h, c, codec = real_decode(make_gif(12, 9))
    assert (w, h) == (12, 9)
    assert codec in ("pil", "header")


def test_real_decode_jpeg_header():
    from sierradb_spark.functions import _media_codec as mc

    if mc._PILImage is not None:
        pytest.skip("PIL decodes full JPEGs; the header-only fixture "
                    "targets the stdlib parser")
    w, h, c, codec = real_decode(make_jpeg_header(640, 480))
    assert (w, h, c, codec) == (640, 480, 1, "header")


def test_real_decode_rejects_non_image():
    assert real_decode(b"not an image at all") is None


def test_decode_media_mixed_corpus(spark):
    """A mixed corpus of real PNG/GIF bytes and arbitrary blobs through
    the full mapInPandas path: real rows get file dimensions, others the
    stub's hash-derived dimensions, codec column audits which."""
    png, gif, junk = make_png(33, 17), make_gif(5, 7), b"\x00\x01plainbytes"
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(gif)), (3, bytearray(junk))],
        "doc_id long, media binary",
    )
    rows = {r["doc_id"]: r for r in decode_media(df).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (33, 17)
    assert rows[1]["codec"] in ("pil", "header")
    assert (rows[2]["width"], rows[2]["height"]) == (5, 7)
    fw, fh, fc = fake_decode(junk)
    assert (rows[3]["width"], rows[3]["height"], rows[3]["channels"]) == (fw, fh, fc)
    assert rows[3]["codec"] == "stub"
    assert rows[1]["n_bytes"] == len(png)
