"""Vendored pure-Python PNG codec — the third backend of the image
seam (``multimodal._require_pil``).

The container ships neither Pillow nor PyAV, which left the real-decode
path permanently skipped (r5 verdict #7). This module implements just
enough of PNG from the public specification (RFC 2083 / W3C PNG) with
only the stdlib (``zlib``, ``struct``) to *exercise* the real path:

- **decode**: 8-bit-depth, non-interlaced images, color types 0 (gray),
  2 (RGB), 4 (gray+alpha), 6 (RGBA); all five scanline filters
  (None/Sub/Up/Average/Paeth).
- **encode**: filter-0 scanlines, one IDAT, for the same color types.
- :class:`PngImage` — a minimal PIL-compatible surface (``open`` /
  ``width`` / ``height`` / ``getbands`` / ``getdata`` / ``convert("L")``
  / ``resize`` / ``save``) so the multimodal operators run unmodified
  against either backend. Pillow remains preferred when importable
  (full format coverage, SIMD speed); this backend makes the seam
  *testable everywhere* for PNG payloads.

Resampling is nearest-neighbor (Pillow defaults to bicubic) — derived
pixel VALUES are backend-dependent by design; shape, schema, and
determinism are the contract the operators test.
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"\x89PNG\r\n\x1a\n"

#: color type -> channel count (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_BANDS = {0: ("L",), 2: ("R", "G", "B"), 4: ("L", "A"), 6: ("R", "G", "B", "A")}


class PngFormatError(ValueError):
    """Not a PNG, or a PNG feature outside this codec's subset."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode(data: bytes) -> tuple[int, int, int, bytearray]:
    """PNG bytes -> (width, height, channels, flat row-major samples)."""
    if data[:8] != _MAGIC:
        raise PngFormatError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise PngFormatError(f"bit depth {depth} unsupported (8 only)")
            if color not in _CHANNELS:
                raise PngFormatError(f"color type {color} unsupported")
            if interlace:
                raise PngFormatError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if w is None:
        raise PngFormatError("missing IHDR")
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise PngFormatError(f"scanline filter {ftype} invalid")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return w, h, ch, out


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def encode(samples: bytes, width: int, height: int, channels: int) -> bytes:
    """Flat row-major 8-bit samples -> PNG bytes (filter 0, one IDAT)."""
    color = {1: 0, 3: 2, 2: 4, 4: 6}.get(channels)
    if color is None:
        raise PngFormatError(f"{channels} channels unsupported")
    stride = width * channels
    if len(samples) != height * stride:
        raise PngFormatError(
            f"sample count {len(samples)} != {height}x{stride}"
        )
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(samples[y * stride : (y + 1) * stride])
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


class PngImage:
    """Minimal PIL-compatible image over the pure codec (see module
    docstring for the exact supported surface)."""

    def __init__(self, width: int, height: int, channels: int, samples: bytearray):
        self.width = width
        self.height = height
        self._ch = channels
        self._px = samples

    # -- PIL-compatible surface ------------------------------------------
    @property
    def size(self) -> tuple[int, int]:
        return (self.width, self.height)

    def getbands(self) -> tuple[str, ...]:
        return _BANDS[{1: 0, 3: 2, 2: 4, 4: 6}[self._ch]]

    def getdata(self):
        if self._ch == 1:
            return list(self._px)
        it = iter(self._px)
        return list(zip(*[it] * self._ch))

    def convert(self, mode: str) -> "PngImage":
        if mode != "L":
            raise PngFormatError(f"convert({mode!r}) unsupported (L only)")
        if self._ch == 1:
            return self
        out = bytearray(self.width * self.height)
        ch = self._ch
        for i in range(self.width * self.height):
            o = i * ch
            if ch == 2:  # gray+alpha
                out[i] = self._px[o]
            else:  # ITU-R 601 luma, PIL's integer coefficients
                out[i] = (
                    self._px[o] * 299
                    + self._px[o + 1] * 587
                    + self._px[o + 2] * 114
                ) // 1000
        return PngImage(self.width, self.height, 1, out)

    def resize(self, size: tuple[int, int]) -> "PngImage":
        tw, th = size
        ch = self._ch
        out = bytearray(tw * th * ch)
        for y in range(th):
            sy = min(self.height - 1, (y * self.height) // th)
            row = sy * self.width * ch
            for x in range(tw):
                sx = min(self.width - 1, (x * self.width) // tw)
                src = row + sx * ch
                dst = (y * tw + x) * ch
                out[dst : dst + ch] = self._px[src : src + ch]
        return PngImage(tw, th, ch, out)

    def save(self, fp, format: str = "PNG") -> None:
        if format.upper() != "PNG":
            raise PngFormatError(f"save format {format!r} unsupported")
        fp.write(encode(bytes(self._px), self.width, self.height, self._ch))


class PurePngImageModule:
    """Drop-in for the ``PIL.Image`` module object in the operators'
    usage (``Image.open(io.BytesIO(payload))``)."""

    #: marks the backend in logs/tests
    PURE_PYTHON = True

    @staticmethod
    def open(fp) -> PngImage:
        data = fp.read()
        if data[:2] == b"\xff\xd8":
            # baseline grayscale JPEG — the second real format behind
            # the seam (vendored spec codec, operators/jpegcodec.py)
            from neo4j_arrow_spark.operators import jpegcodec

            return PngImage(*jpegcodec.decode(data))
        return PngImage(*decode(data))

    @staticmethod
    def frombytes(width: int, height: int, channels: int, samples: bytes) -> PngImage:
        return PngImage(width, height, channels, bytearray(samples))
