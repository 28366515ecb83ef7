"""Vendored pure-Python baseline JPEG codec (grayscale) — the second
REAL image format behind the multimodal decode seam (r6 verdict #8;
PNG was the first). Written from the public ITU-T T.81 spec: baseline
sequential DCT, 8-bit, single component (luminance), standard Annex K
quantization and Huffman tables. stdlib only.

Scope (deliberately minimal — the seam needs a real second format, not
a general decoder): SOI/APP*/COM/DQT/SOF0/DHT/SOS/EOI markers, one
8-bit component with 1x1 sampling, no restart intervals, no
progressive/arithmetic modes. Anything else raises
:class:`JpegFormatError` and the multimodal operators surface it the
same way Pillow surfaces a corrupt file.

The encoder exists so tests can fabricate real compressed JPEG bytes
in-container (Pillow is absent); it emits spec-conformant baseline
files (standard tables, 0xFF byte stuffing), and the decoder is
exercised on its output plus hand-built marker streams. JPEG is lossy:
round-trip tests assert bounded per-pixel error, not equality.
"""

from __future__ import annotations

import math
import struct

__all__ = ["JpegFormatError", "decode", "encode"]


class JpegFormatError(ValueError):
    """Malformed or out-of-scope JPEG input."""


# -- Annex K tables ----------------------------------------------------------

#: K.1 luminance quantization table, natural (row-major) order
QUANT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

#: zig-zag scan order: ZIGZAG[k] = natural index of the k-th coefficient
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

#: K.3.3.1 — luminance DC: (BITS counts per code length 1..16, HUFFVAL)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

#: K.3.3.2 — luminance AC
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical assignment (C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


DC_ENC = _canonical_codes(DC_BITS, DC_VALS)
AC_ENC = _canonical_codes(AC_BITS, AC_VALS)

#: (code, length) -> symbol, for the decoder
DC_DEC = {v: s for s, v in DC_ENC.items()}
AC_DEC = {v: s for s, v in AC_ENC.items()}

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
    for u in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _fdct(block: list[float]) -> list[float]:
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += block[x * 8 + y] * _COS[u][x] * _COS[v][y]
            out[u * 8 + v] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct(coef: list[float]) -> list[float]:
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += _C[u] * _C[v] * coef[u * 8 + v] * _COS[u][x] * _COS[v][y]
            out[x * 8 + y] = 0.25 * s
    return out


# -- bit IO with 0xFF byte stuffing ------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing (B.1.1.5)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # 1-pad the final byte


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise JpegFormatError("truncated entropy-coded data")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise JpegFormatError("unexpected marker in scan data")
                self.pos += 1  # skip the stuffed 0x00
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude decode (F.2.2.1 EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    """Smallest t with |v| < 2^t."""
    a = abs(v)
    t = 0
    while a:
        a >>= 1
        t += 1
    return t


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise JpegFormatError("invalid Huffman code in scan data")


# -- encode -------------------------------------------------------------------


def encode(samples: bytes, width: int, height: int) -> bytes:
    """Grayscale baseline JPEG from row-major 8-bit ``samples``."""
    if len(samples) != width * height:
        raise JpegFormatError(
            f"sample buffer {len(samples)} != {width}x{height}"
        )
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: Pq=0 (8-bit), Tq=0; coefficients in zig-zag order
    zz_q = bytes(QUANT[ZIGZAG[k]] for k in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    # SOF0: 8-bit precision, 1 component, 1x1 sampling, quant table 0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    out += bytes([1, 0x11, 0])
    # DHT: DC table 0 then AC table 0
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(DC_VALS))
    out += b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(AC_VALS))
    out += b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)
    # SOS: 1 component, DC/AC table 0, full spectral selection
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])

    bw = _BitWriter()
    prev_dc = 0
    bh = (height + 7) // 8
    bwid = (width + 7) // 8
    for by in range(bh):
        for bx in range(bwid):
            block = []
            for y in range(8):
                sy = min(by * 8 + y, height - 1)  # edge replicate
                for x in range(8):
                    sx = min(bx * 8 + x, width - 1)
                    block.append(float(samples[sy * width + sx]) - 128.0)
            coef = _fdct(block)
            q = [
                int(round(coef[ZIGZAG[k]] / QUANT[ZIGZAG[k]]))
                for k in range(64)
            ]
            diff = q[0] - prev_dc
            prev_dc = q[0]
            t = _category(diff)
            code, length = DC_ENC[t]
            bw.put(code, length)
            if t:
                bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
            run = 0
            last_nz = max((k for k in range(1, 64) if q[k]), default=0)
            for k in range(1, last_nz + 1):
                if q[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = AC_ENC[0xF0]  # ZRL
                    bw.put(c, ln)
                    run -= 16
                t = _category(q[k])
                c, ln = AC_ENC[(run << 4) | t]
                bw.put(c, ln)
                bw.put(q[k] if q[k] >= 0 else q[k] + (1 << t) - 1, t)
                run = 0
            if last_nz < 63:
                c, ln = AC_ENC[0x00]  # EOB
                bw.put(c, ln)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decode -------------------------------------------------------------------


def _parse_dht(body: bytes, tables: dict) -> None:
    i = 0
    while i < len(body):
        tc_th = body[i]
        bits = list(body[i + 1 : i + 17])
        n = sum(bits)
        vals = list(body[i + 17 : i + 17 + n])
        enc = _canonical_codes(bits, vals)
        tables[(tc_th >> 4, tc_th & 0xF)] = {v: s for s, v in enc.items()}
        i += 17 + n


def decode(data: bytes) -> tuple[int, int, int, bytearray]:
    """``(width, height, channels=1, samples)`` from baseline grayscale
    JPEG bytes (same return shape as :func:`pngcodec.decode`)."""
    try:
        return _decode(data)
    except (IndexError, struct.error) as exc:
        raise JpegFormatError(f"truncated/malformed JPEG: {exc}") from exc


def _decode(data: bytes) -> tuple[int, int, int, bytearray]:
    if data[:2] != b"\xff\xd8":
        raise JpegFormatError("not a JPEG (missing SOI)")
    i = 2
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = None
    dc_id = ac_id = 0
    tq = 0
    while i < len(data):
        if data[i] != 0xFF:
            raise JpegFormatError(f"expected marker at byte {i}")
        m = data[i + 1]
        i += 2
        if m == 0xD9:  # EOI
            raise JpegFormatError("EOI before scan data")
        (seglen,) = struct.unpack(">H", data[i : i + 2])
        body = data[i + 2 : i + seglen]
        if m == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq_tq = body[j]
                if pq_tq >> 4:
                    raise JpegFormatError("16-bit quant tables unsupported")
                zz = list(body[j + 1 : j + 65])
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = zz[k]
                quant[pq_tq & 0xF] = nat
                j += 65
        elif m == 0xC4:  # DHT
            _parse_dht(body, huff)
        elif m == 0xC0:  # SOF0 baseline
            prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp != 1:
                raise JpegFormatError(
                    "only 8-bit single-component (grayscale) baseline "
                    "JPEG is supported"
                )
            if body[7] != 0x11:
                raise JpegFormatError("subsampling unsupported for gray")
            tq = body[8]
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise JpegFormatError("non-baseline JPEG mode unsupported")
        elif m == 0xDA:  # SOS
            if width is None:
                raise JpegFormatError("SOS before SOF0")
            dc_id, ac_id = body[2] >> 4, body[2] & 0xF
            i += seglen
            break
        # APPn / COM / anything else: skip
        i += seglen
    else:
        raise JpegFormatError("no scan data")

    # the entropy-coded segment runs to the EOI marker
    end = data.rfind(b"\xff\xd9")
    if end < 0:
        raise JpegFormatError("missing EOI")
    br = _BitReader(data[i:end])
    dc_tab = huff.get((0, dc_id))
    ac_tab = huff.get((1, ac_id))
    q = quant.get(tq)
    if dc_tab is None or ac_tab is None or q is None:
        raise JpegFormatError("missing Huffman/quant table")

    bh = (height + 7) // 8
    bw = (width + 7) // 8
    samples = bytearray(width * height)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            zz = [0] * 64
            t = _huff_decode(br, dc_tab)
            prev_dc += _extend(br.bits(t), t)
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = _huff_decode(br, ac_tab)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                k += sym >> 4
                if k > 63:
                    raise JpegFormatError("AC run past block end")
                t = sym & 0xF
                zz[k] = _extend(br.bits(t), t)
                k += 1
            coef = [0.0] * 64
            for k in range(64):
                coef[ZIGZAG[k]] = zz[k] * q[ZIGZAG[k]]
            px = _idct(coef)
            for y in range(8):
                sy = by * 8 + y
                if sy >= height:
                    break
                row = sy * width
                for x in range(8):
                    sx = bx * 8 + x
                    if sx >= width:
                        continue
                    v = int(round(px[y * 8 + x] + 128.0))
                    samples[row + sx] = 0 if v < 0 else (255 if v > 255 else v)
    return width, height, 1, samples
