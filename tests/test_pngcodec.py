"""Unit tests for the vendored pure-Python PNG codec (the third image
seam backend, operators/pngcodec.py) — no Spark needed."""

from __future__ import annotations

import io
import struct
import zlib

import pytest

from neo4j_arrow_spark.operators import pngcodec as P


def test_roundtrip_rgb():
    px = bytes(range(4 * 3 * 2)) * 1  # 4x2 RGB ramp
    data = P.encode(px, 4, 2, 3)
    w, h, ch, out = P.decode(data)
    assert (w, h, ch) == (4, 2, 3)
    assert bytes(out) == px


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_all_color_types(channels):
    w, h = 5, 3
    px = bytes((i * 37) % 256 for i in range(w * h * channels))
    ww, hh, ch, out = P.decode(P.encode(px, w, h, channels))
    assert (ww, hh, ch) == (w, h, channels)
    assert bytes(out) == px


def _raw_png(width, height, color, raw_scanlines: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(raw_scanlines))
        + P._chunk(b"IEND", b"")
    )


def test_decode_sub_up_average_paeth_filters():
    # hand-filtered 3x3 grayscale, pixel value = x + 10*y
    rows = [[x + 10 * y for x in range(3)] for y in range(3)]
    # row0 filter 1 (Sub): first byte raw, rest delta vs left
    r0 = bytes([1, rows[0][0], 1, 1])
    # row1 filter 2 (Up): delta vs row above = 10 each
    r1 = bytes([2, 10, 10, 10])
    # row2 filter 3 (Average): raw - (left + up)//2
    vals2, prev = rows[2], rows[1]
    a0 = (0 + prev[0]) // 2
    a1 = (vals2[0] + prev[1]) // 2
    a2 = (vals2[1] + prev[2]) // 2
    r2 = bytes([3, vals2[0] - a0, vals2[1] - a1, vals2[2] - a2])
    w, h, ch, out = P.decode(_raw_png(3, 3, 0, r0 + r1 + r2))
    assert list(out) == [v for r in rows for v in r]
    # paeth: 2x2 where predictor picks left for x>0 (c == up on row 1)
    pr0 = bytes([0, 7, 9])
    pr1 = bytes([4, 50 - 7, 60 - 50])  # a=left, b=up, c=up-left
    w, h, ch, out = P.decode(_raw_png(2, 2, 0, pr0 + pr1))
    assert list(out) == [7, 9, 50, 60]


def test_rejects_non_png_and_unsupported():
    with pytest.raises(P.PngFormatError, match="signature"):
        P.decode(b"JFIF....")
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IEND", b"")
    )
    with pytest.raises(P.PngFormatError, match="depth"):
        P.decode(bad)


def test_pil_surface_convert_resize_getdata_save():
    img = P.PurePngImageModule.open(
        io.BytesIO(P.encode(bytes([255, 0, 0, 0, 0, 255] * 2), 2, 2, 3))
    )
    assert img.size == (2, 2) and img.getbands() == ("R", "G", "B")
    assert img.getdata()[0] == (255, 0, 0)
    gray = img.convert("L")
    assert gray.getbands() == ("L",)
    assert gray.getdata() == [76, 29, 76, 29]  # ITU-R 601 luma
    big = img.resize((4, 4))
    assert big.size == (4, 4)
    assert big.getdata()[0] == (255, 0, 0)  # nearest-neighbor
    buf = io.BytesIO()
    big.save(buf, format="PNG")
    w, h, ch, out = P.decode(buf.getvalue())
    assert (w, h, ch) == (4, 4, 3)
