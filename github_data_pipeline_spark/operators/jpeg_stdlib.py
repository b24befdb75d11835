"""Minimal stdlib baseline-JFIF codec — the JPEG twin of the stdlib
PNG path in operators/multimodal.py.

Scope (documented, enforced): baseline sequential DCT (SOF0), 8-bit
samples, 1 (grayscale) or 3 (YCbCr 4:4:4 — no chroma subsampling)
components, Huffman entropy coding, no restart markers, no progressive
scans. That is exactly what :func:`encode_baseline_jpeg` emits, so the
container's multimodal tests exercise a REAL JPEG decode end to end
without an image library; a payload outside the subset raises
``ValueError`` and decode_image degrades down its documented fallback
chain. Everything here is from the public JPEG/JFIF specification
(ITU-T T.81): standard quantization and Huffman tables, zig-zag order,
level shift, 2-D DCT-II — no external code.

Performance note: this is pure Python (a few ms per small image) and
exists for codec-less containers and tests; a production cluster ships
a real codec, and the Spark-side plumbing (binary column, Arrow
batches, mapInPandas shape) is identical either way.
"""

from __future__ import annotations

import math
import struct
from typing import Any

# ITU-T T.81 Annex K.1 luminance quantization table (quality ~50),
# in natural (row-major) order after de-zig-zag.
_QTABLE_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
# Annex K.2 chrominance table.
_QTABLE_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3: standard Huffman tables as (BITS counts, HUFFVAL symbols).
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# Decode-side guard: largest width*height this codec will allocate
# plane buffers for. SOF dimensions come straight from untrusted bytes;
# anything above this cap raises ValueError (cheap, catchable) instead
# of attempting a multi-GB list allocation (OOM-kill, uncatchable).
MAX_DECODE_PIXELS = 16_000_000

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), per T.81 C.2 canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_huffman_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_huffman_codes(bits, vals).items()
    }


# --------------------------------------------------------------------------
# Encoder (fixture generation: tests feed its output to the decoder)
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _fdct_quant(block: list[float], qtable: list[int]) -> list[int]:
    """2-D DCT-II + quantization, natural order in/out. O(n^3) direct
    form — fixture-sized images only."""
    out = [0] * 64
    for v in range(8):
        cv = (1 / math.sqrt(2)) if v == 0 else 1.0
        for u in range(8):
            cu = (1 / math.sqrt(2)) if u == 0 else 1.0
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (
                        block[y * 8 + x]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            val = s * cu * cv / 4.0
            q = qtable[v * 8 + u]
            out[v * 8 + u] = int(round(val / q))
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(
    w: _BitWriter,
    coefs: list[int],
    prev_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    zz = [coefs[_ZIGZAG[i]] for i in range(64)]
    size, bits = _magnitude(zz[0] - prev_dc)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(bits, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i] != 0:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size, bits = _magnitude(zz[i])
        code, length = ac_codes[(run << 4) | size]
        w.write(code, length)
        w.write(bits, size)
        run = 0
    if last_nz != 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return zz[0]


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht_payload(tc_th: int, table: tuple[list[int], list[int]]) -> bytes:
    bits, vals = table
    return bytes([tc_th] + bits + vals)


def encode_baseline_jpeg(width: int, height: int, rgb: list[tuple[int, int, int]]) -> bytes:
    """Encode ``rgb`` (row-major, len == width*height) as a baseline
    sequential JFIF: SOF0, 4:4:4, standard tables. Pure stdlib."""
    if len(rgb) != width * height:
        raise ValueError("rgb length mismatch")
    # RGB -> YCbCr (BT.601 full range, the JFIF convention)
    planes: list[list[float]] = [[], [], []]
    for r, g, b in rgb:
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        planes[0].append(y)
        planes[1].append(cb)
        planes[2].append(cr)

    bw = (width + 7) // 8
    bh = (height + 7) // 8
    qt = [_QTABLE_LUMA, _QTABLE_CHROMA, _QTABLE_CHROMA]
    dc_codes = [
        _build_huffman_codes(*_DC_LUMA),
        _build_huffman_codes(*_DC_CHROMA),
    ]
    ac_codes = [
        _build_huffman_codes(*_AC_LUMA),
        _build_huffman_codes(*_AC_CHROMA),
    ]
    w = _BitWriter()
    prev_dc = [0, 0, 0]
    # 4:4:4 non-interleaved-shape MCU: one 8x8 block per component per MCU
    for by in range(bh):
        for bx in range(bw):
            for ci in range(3):
                block = []
                for yy in range(8):
                    for xx in range(8):
                        px = min(bx * 8 + xx, width - 1)
                        py = min(by * 8 + yy, height - 1)
                        block.append(planes[ci][py * width + px] - 128.0)
                coefs = _fdct_quant(block, qt[ci])
                t = 0 if ci == 0 else 1
                prev_dc[ci] = _encode_block(
                    w, coefs, prev_dc[ci], dc_codes[t], ac_codes[t]
                )
    w.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(_QTABLE_LUMA[_ZIGZAG[i]] for i in range(64)))
    out += _seg(0xDB, bytes([0x01]) + bytes(_QTABLE_CHROMA[_ZIGZAG[i]] for i in range(64)))
    sof = struct.pack(">BHHB", 8, height, width, 3)
    sof += bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_payload(0x00, _DC_LUMA))
    out += _seg(0xC4, _dht_payload(0x10, _AC_LUMA))
    out += _seg(0xC4, _dht_payload(0x01, _DC_CHROMA))
    out += _seg(0xC4, _dht_payload(0x11, _AC_CHROMA))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += _seg(0xDA, sos)
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("entropy stream truncated")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huffman(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


_IDCT_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)] for x in range(8)
]


def _idct_block(coefs: list[int]) -> list[int]:
    """Separable 2-D inverse DCT, natural-order input, clamped
    level-shifted bytes out."""
    # rows
    tmp = [0.0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                cu = (1 / math.sqrt(2)) if u == 0 else 1.0
                s += cu * coefs[y * 8 + u] * _IDCT_COS[x][u]
            tmp[y * 8 + x] = s / 2.0
    out = [0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for v in range(8):
                cv = (1 / math.sqrt(2)) if v == 0 else 1.0
                s += cv * tmp[v * 8 + x] * _IDCT_COS[y][v]
            val = int(round(s / 2.0)) + 128
            out[y * 8 + x] = 0 if val < 0 else 255 if val > 255 else val
    return out


def decode_baseline_jpeg(payload: bytes) -> dict[str, Any]:
    """Decode a baseline-JFIF payload within the documented subset to
    (n_bytes, width, height, mean_pixel over RGB bytes) — the same
    contract as multimodal._decode_pil / _decode_png_stdlib."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    dc_dec: dict[int, dict[tuple[int, int], int]] = {}
    ac_dec: dict[int, dict[tuple[int, int], int]] = {}
    width = height = 0
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qtable id)
    scan: list[tuple[int, int, int]] = []  # (comp idx, dc table, ac table)
    data = b""
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        if pos + 2 > len(payload):
            raise ValueError("truncated segment header")
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = list(seg[p + 1 : p + 65])
                nat = [0] * 64
                for i in range(64):
                    nat[_ZIGZAG[i]] = zz[i]
                qtables[tq] = nat
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                dec = _build_huffman_decoder(bits, vals)
                (ac_dec if tc else dc_dec)[th] = dec
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, height, width, nc = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError("only 8-bit samples supported")
            if nc not in (1, 3):
                raise ValueError("only 1 or 3 components supported")
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise ValueError("chroma subsampling unsupported")
                comps.append((cid, samp, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline SOF unsupported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            byid = {cid: i for i, (cid, _s, _q) in enumerate(comps)}
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((byid[cid], tabs >> 4, tabs & 0x0F))
            data = payload[pos + seglen :]
            break
        pos += seglen
    if not (width and height and scan):
        raise ValueError("missing SOF/SOS")
    # Cap the declared frame size BEFORE allocating plane buffers: the
    # SOF dimensions are attacker-controlled bytes, and a ~200-byte
    # hostile payload declaring 65535x65535 would otherwise force a
    # ~34 GB-per-component allocation that can OOM-kill the executor
    # (an uncatchable failure on overcommitting hosts, defeating the
    # one-hostile-document-must-not-fail-the-job contract). 16M pixels
    # matches the fixture-scale scope documented for this codec;
    # oversized declarations take the cheap ValueError -> fake-decode
    # fallback path instead.
    if width * height > MAX_DECODE_PIXELS:
        raise ValueError(
            f"declared frame {width}x{height} exceeds decode pixel cap"
        )

    r = _BitReader(data)
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    nc = len(comps)
    planes = [[0] * (bw * 8 * bh * 8) for _ in range(nc)]
    prev_dc = [0] * nc
    for by in range(bh):
        for bx in range(bw):
            for ci, dt, at in scan:
                coefs = [0] * 64
                sym = r.read_huffman(dc_dec[dt])
                diff = _extend(r.read_bits(sym), sym)
                prev_dc[ci] += diff
                zz = [0] * 64
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    sym = r.read_huffman(ac_dec[at])
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0x0F
                    if size == 0:
                        if run != 15:
                            raise ValueError("bad AC symbol")
                        k += 16  # ZRL
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("AC run overflows block")
                    zz[k] = _extend(r.read_bits(size), size)
                    k += 1
                q = qtables[comps[ci][2]]
                for i in range(64):
                    coefs[_ZIGZAG[i]] = zz[i] * q[_ZIGZAG[i]]
                px = _idct_block(coefs)
                row_w = bw * 8
                for yy in range(8):
                    base = (by * 8 + yy) * row_w + bx * 8
                    planes[ci][base : base + 8] = px[yy * 8 : yy * 8 + 8]

    # crop + color-convert, accumulate the mean over RGB bytes
    total = 0
    row_w = bw * 8
    for y in range(height):
        for x in range(width):
            i = y * row_w + x
            if nc == 1:
                lum = planes[0][i]
                total += 3 * lum
            else:
                yv, cb, cr = planes[0][i], planes[1][i] - 128, planes[2][i] - 128
                rr = min(255, max(0, int(round(yv + 1.402 * cr))))
                gg = min(255, max(0, int(round(yv - 0.344136 * cb - 0.714136 * cr))))
                bb = min(255, max(0, int(round(yv + 1.772 * cb))))
                total += rr + gg + bb
    n = width * height * 3
    return {
        "n_bytes": len(payload),
        "width": int(width),
        "height": int(height),
        "mean_pixel": (total / n) if n else 0.0,
    }
