"""Vendored baseline-JPEG grayscale codec (operators/jpegcodec.py) —
the SECOND real image format behind the multimodal decode seam (r6
verdict #8; PNG was the first). Spec codec written from public ITU-T
T.81 (Annex K tables); JPEG is lossy, so round-trips assert bounded
per-pixel error, not equality."""

from __future__ import annotations

import io

import pytest

from neo4j_arrow_spark.operators import jpegcodec as J


def _gradient(w: int, h: int) -> bytes:
    return bytes(min(255, x * 8 + y * 3) for y in range(h) for x in range(w))


def test_roundtrip_gradient_bounded_error():
    w, h = 24, 17  # non-multiples of 8 exercise edge replication
    img = _gradient(w, h)
    enc = J.encode(img, w, h)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    dw, dh, ch, dec = J.decode(enc)
    assert (dw, dh, ch) == (w, h, 1)
    errs = [abs(a - b) for a, b in zip(img, dec)]
    # Annex-K quant on a smooth ramp: tiny error; a broken DCT/huffman
    # path is off by tens to hundreds
    assert max(errs) <= 6 and sum(errs) / len(errs) < 2.0


def test_flat_block_near_exact():
    flat = bytes([137]) * (16 * 16)
    _, _, _, dec = J.decode(J.encode(flat, 16, 16))
    assert max(abs(137 - b) for b in dec) <= 1


def test_sharp_edges_still_bounded():
    # checkerboard of 8x8 tiles aligns with block boundaries — each
    # block is flat, so even hard edges decode near-exactly
    w = h = 32
    img = bytes(
        (255 if ((x // 8) + (y // 8)) % 2 == 0 else 0)
        for y in range(h)
        for x in range(w)
    )
    _, _, _, dec = J.decode(J.encode(img, w, h))
    assert max(abs(a - b) for a, b in zip(img, dec)) <= 2


def test_marker_structure_and_tables_roundtrip():
    # DQT/DHT/SOF0/SOS present; the decoder reads the tables from the
    # STREAM (not the module constants), so a re-encoded table change
    # would be caught here
    enc = J.encode(bytes(64), 8, 8)
    for marker in (b"\xff\xdb", b"\xff\xc4", b"\xff\xc0", b"\xff\xda"):
        assert marker in enc
    assert enc.count(b"\xff\xc4") >= 2  # DC and AC tables


def test_rejects_non_jpeg_and_truncation():
    with pytest.raises(J.JpegFormatError, match="SOI"):
        J.decode(b"PNG not jpeg")
    enc = J.encode(_gradient(16, 16), 16, 16)
    with pytest.raises(J.JpegFormatError):
        J.decode(enc[:40])  # cut inside the headers


def test_pil_shim_sniffs_jpeg():
    # the multimodal seam's Image.open routes by magic bytes
    from neo4j_arrow_spark.operators.pngcodec import PurePngImageModule

    img = _gradient(16, 8)
    shim = PurePngImageModule.open(io.BytesIO(J.encode(img, 16, 8)))
    assert shim.size == (16, 8)
    assert shim.getbands() == ("L",)
    data = shim.getdata()
    assert max(abs(a - b) for a, b in zip(img, data)) <= 6
