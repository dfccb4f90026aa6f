"""Baseline-sequential JPEG codec — numpy + stdlib only.

The r6 verdict scoped the multimodal seam to "header-only parse;
DCT/VP8 entropy decode is not reasonable stdlib work". This module
closes the JPEG half of that seam anyway: a complete ITU T.81
baseline-sequential (SOF0) decoder — marker parse, DQT/DHT table
build, Huffman entropy decode with byte-unstuffing and restart
markers, dequant + inverse zigzag, vectorized 8x8 IDCT as two numpy
matmuls, chroma upsampling for arbitrary sampling factors, YCbCr->RGB
— plus the matching encoder (used by tests for roundtrips and by
anyone who needs to WRITE images from the engine without PIL).

Scope, stated loudly:
- baseline sequential DCT, 8-bit precision, grayscale or YCbCr
  (1 or 3 components), any h/v sampling factors up to 2 (covers
  4:4:4, 4:2:2, 4:2:0), restart intervals: DECODED;
- progressive (SOF2), arithmetic coding, 12-bit, CMYK/4-component:
  NOT decoded — :func:`decode_baseline_jpeg` returns ``None`` and the
  caller keeps the header-only metadata path
  (:func:`multimodal.parse_jpeg_header`).

The hot path is numpy: entropy decode is the only per-symbol Python
loop (inherent to Huffman), everything after coefficients is
vectorized over all blocks of a component at once. That is the right
cost shape for a mapInPandas decode operator — unit-scale payloads
decode in milliseconds; swap PIL in for production rasters (the
documented seam, unchanged).

Reference parity note: the reference engine (sematext/HBaseWD) has no
image surface at all; this belongs to the engine's LLM-pipeline
extension layer (multimodal columns, brief §extensions).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- tables
# ITU T.81 Annex K.1 — example quantization tables (luminance,
# chrominance), in natural (row-major) order.
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# zigzag scan order: ZIGZAG[i] = natural index of the i-th zigzag coeff
def _zigzag_order() -> np.ndarray:
    # diagonal s runs (0,s)->(s,0) when s is odd, (s,0)->(0,s) when
    # even (T.81 Figure 5: the first step is right, then down-left)
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (
            rc[0] + rc[1],
            rc[0] if (rc[0] + rc[1]) % 2 else -rc[0],
        ),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.3 — typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


# 8x8 orthonormal DCT-II matrix: block_dct = A @ block @ A.T
def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    a = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * np.sqrt(2 / 8)
    a[0, :] = np.sqrt(1 / 8)
    return a


DCT_A = _dct_matrix()


# ------------------------------------------------------ canonical codes
def _build_codes(bits: list[int], vals: list[int]) -> dict[int, str]:
    """symbol -> canonical Huffman code string (T.81 C.2)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = format(code, f"0{length}b")
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-at-a-time decoder."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


# ------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: str) -> None:
        for ch in code:
            self.acc = (self.acc << 1) | (ch == "1")
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write("1")  # pad with 1-bits (T.81 F.1.2.3)


def _magnitude(v: int) -> tuple[int, str]:
    """(category, magnitude bits) for a DC diff / AC coeff (F.1.2.1)."""
    if v == 0:
        return 0, ""
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, format(bits, f"0{cat}b")


def encode_baseline_jpeg(
    pixels: np.ndarray, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """Encode an ``(h, w)`` grayscale or ``(h, w, 3)`` RGB uint8 array
    as a baseline-sequential JFIF JPEG (Annex K tables, quality ~50).
    ``subsample=True`` uses 4:2:0 chroma; default 4:4:4.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (the error-resilience feature real encoders use for
    parallel-decodable strips)."""
    px = np.asarray(pixels)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        comps = [px.astype(np.float64) - 128.0]
    else:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y - 128.0, cb - 128.0, cr - 128.0]
    sampling = [(1, 1)] * len(comps)
    if not gray:
        sampling = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)

    # per-component padded planes (subsampled for chroma)
    planes = []
    for ci, c in enumerate(comps):
        sh, sv = sampling[ci]
        if (sh, sv) != (hmax, vmax):
            # box-filter downsample by the sampling ratio
            fy, fx = vmax // sv, hmax // sh
            ph = -(-h // fy) * fy
            pw = -(-w // fx) * fx
            cpad = np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge")
            c = cpad.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        planes.append(c)

    # MCU geometry
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x, mcus_y = -(-w // mcu_w), -(-h // mcu_h)

    # pad planes to whole blocks per their sampling
    padded = []
    for ci, c in enumerate(planes):
        sh, sv = sampling[ci]
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        padded.append(
            np.pad(c, ((0, th - c.shape[0]), (0, tw - c.shape[1])), mode="edge")
        )

    qts = [QUANT_LUMA] + ([] if gray else [QUANT_CHROMA])
    dc_codes = [_build_codes(DC_LUMA_BITS, DC_LUMA_VALS)] + (
        [] if gray else [_build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    )
    ac_codes = [_build_codes(AC_LUMA_BITS, AC_LUMA_VALS)] + (
        [] if gray else [_build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]
    )
    tsel = [0] + [1] * (len(comps) - 1)  # component -> table index

    # quantized coefficient blocks per component, vectorized
    qblocks = []
    for ci, c in enumerate(padded):
        bh, bw = c.shape[0] // 8, c.shape[1] // 8
        blocks = c.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ij,xyjk,lk->xyil", DCT_A, blocks, DCT_A)
        q = np.round(coef / qts[tsel[ci]]).astype(np.int32)
        qblocks.append(q)

    bw_ = _BitWriter()
    pred = [0] * len(comps)
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw_.flush()
                bw_.out += bytes(
                    [0xFF, 0xD0 + ((mcu_i // restart_interval - 1) % 8)]
                )
                pred = [0] * len(comps)
            mcu_i += 1
            for ci in range(len(comps)):
                sh, sv = sampling[ci]
                for by in range(sv):
                    for bx in range(sh):
                        blk = qblocks[ci][my * sv + by, mx * sh + bx]
                        zz = blk.ravel()[ZIGZAG]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        cat, mb = _magnitude(diff)
                        bw_.write(dc_codes[tsel[ci]][cat])
                        bw_.write(mb)
                        run = 0
                        nz = np.nonzero(zz[1:])[0]
                        last = nz[-1] + 1 if len(nz) else 0
                        for i in range(1, last + 1):
                            v = int(zz[i])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                bw_.write(ac_codes[tsel[ci]][0xF0])  # ZRL
                                run -= 16
                            cat, mb = _magnitude(v)
                            bw_.write(ac_codes[tsel[ci]][(run << 4) | cat])
                            bw_.write(mb)
                            run = 0
                        if last < 63:
                            bw_.write(ac_codes[tsel[ci]][0x00])  # EOB
    bw_.flush()

    # ---- container
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, qt in enumerate(qts):
        out += seg(0xDB, bytes([ti]) + bytes(qt.ravel()[ZIGZAG].astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for ci in range(len(comps)):
        sof += bytes([ci + 1, (sampling[ci][0] << 4) | sampling[ci][1], tsel[ci]])
    out += seg(0xC0, sof)
    huffs = [
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
    ] + (
        []
        if gray
        else [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    )
    for tc_th, bits, vals in huffs:
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for ci in range(len(comps)):
        sos += bytes([ci + 1, (tsel[ci] << 4) | tsel[ci]])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------- decoder
class _BitReader:
    """Entropy-segment bit reader: removes 0xFF00 stuffing, stops at
    any real marker (leaves it for the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.n <= 24:
            if self.marker is not None or self.pos >= len(d):
                return
            b0 = d[self.pos]
            if b0 == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
                if nxt == 0x00:  # stuffed data byte
                    self.pos += 2
                    self.acc = (self.acc << 8) | 0xFF
                    self.n += 8
                else:  # real marker (RSTn/EOI/...): stop buffering
                    self.marker = nxt if nxt is not None else 0xD9
                    return
            else:
                self.pos += 1
                self.acc = (self.acc << 8) | b0
                self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
            if self.n == 0:
                raise EOFError("entropy data exhausted")
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Discard pad bits, consume the expected RSTn marker, resume
        on a byte edge. At a restart boundary every real data bit has
        been consumed — whatever remains buffered is byte padding (and
        possibly a stuffed pad byte), safe to drop."""
        self.acc = 0
        self.n = 0
        while self.marker is None and self.pos < len(self.data):
            if (
                self.data[self.pos] == 0xFF
                and self.pos + 1 < len(self.data)
                and self.data[self.pos + 1] != 0x00
            ):
                self.marker = self.data[self.pos + 1]
                break
            self.pos += 1
        if self.marker is None or not (0xD0 <= self.marker <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2  # skip FF Dx
        self.marker = None


def _huff_decode(br: _BitReader, dmap: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = dmap.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    """T.81 F.2.2.1 EXTEND: magnitude bits -> signed value."""
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


# decode ceiling: same bomb-guard stance as parse_png — a tiny stream
# declaring a huge raster must not allocate gigabytes on an executor.
# 16M pixels ≈ 4096x4096; larger rasters keep the header-only path.
JPEG_MAX_PIXELS = 1 << 24


def decode_baseline_jpeg(
    b: bytes, max_pixels: int = JPEG_MAX_PIXELS
) -> np.ndarray | None:
    """Decode a baseline-sequential JPEG to an ``(h, w)`` grayscale or
    ``(h, w, 3)`` RGB uint8 array. Returns ``None`` for anything
    outside the supported envelope (progressive, arithmetic, 12-bit,
    4 components, rasters past ``max_pixels``, malformed streams) —
    callers keep the header-only metadata path in that case, never
    crash."""
    try:
        return _decode(b, max_pixels)
    except (ValueError, EOFError, IndexError, KeyError, struct.error):
        return None


def _decode(b: bytes, max_pixels: int) -> np.ndarray | None:
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> map
    frame = None
    restart = 0
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        while i < len(b) and b[i] == 0xFF:
            i += 1
        if i >= len(b):
            return None
        marker = b[i]
        i += 1
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            return None  # EOI before SOS
        seglen = int.from_bytes(b[i : i + 2], "big")
        if seglen < 2 or i + seglen > len(b):
            return None
        body = b[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                j += 1
                n = 64 * (2 if pq else 1)
                raw = body[j : j + n]
                j += n
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int32)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                )
                nat = np.empty(64, dtype=np.int32)
                nat[ZIGZAG] = vals
                qts[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                n = sum(bits)
                vals = list(body[j + 17 : j + 17 + n])
                huff[(tc, th)] = _build_decode_map(bits, vals)
                j += 17 + n
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec = body[0]
            if prec != 8:
                return None
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if ncomp not in (1, 3) or not w or not h:
                return None
            if w * h > max_pixels:
                return None  # bomb guard: geometry known before any alloc
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif 0xC2 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return None  # progressive/arithmetic/lossless: unsupported
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = body[0]
            sel = {}
            for s in range(ns):
                cs, tt = body[1 + 2 * s : 3 + 2 * s]
                sel[cs] = (tt >> 4, tt & 0x0F)
            return _decode_scan(
                b, i + seglen, frame, sel, qts, huff, restart
            )
        i += seglen
    return None


def _decode_scan(b, pos, frame, sel, qts, huff, restart):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 4 and 1 <= vmax <= 4):
        return None
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    for c in comps:
        if c["id"] not in sel or c["tq"] not in qts:
            return None
        td, ta = sel[c["id"]]
        if (0, td) not in huff or (1, ta) not in huff:
            return None
        c["bw"] = mcus_x * c["h"]
        c["bh"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["bh"], c["bw"], 64), dtype=np.int32)

    br = _BitReader(b, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_i and mcu_i % restart == 0:
                # byte-align + consume RSTn, reset DC predictors
                br.sync_restart()
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                td, ta = sel[c["id"]]
                dmap_dc, dmap_ac = huff[(0, td)], huff[(1, ta)]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        cat = _huff_decode(br, dmap_dc)
                        diff = _extend(br.read_bits(cat), cat) if cat else 0
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, dmap_ac)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        c["coef"][my * c["v"] + by, mx * c["h"] + bx] = zz
            mcu_i += 1

    # dequant + unzigzag + IDCT, vectorized per component
    planes = []
    for c in comps:
        # c["coef"][..., k] is the k-th ZIGZAG coefficient; scatter to
        # natural order, then dequantize with the natural-order table
        nat = np.zeros_like(c["coef"])
        nat[..., ZIGZAG] = c["coef"]
        nat = nat * qts[c["tq"]].ravel()
        blocks = nat.reshape(c["bh"], c["bw"], 8, 8).astype(np.float64)
        spat = np.einsum("ji,xyjk,kl->xyil", DCT_A, blocks, DCT_A) + 128.0
        plane = (
            spat.transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full-resolution grid by pixel replication
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bch = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bch], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
