"""Spec-literal baseline JPEG decoder — the DIFFERENTIAL REFERENCE for
``hbasewd_spark/operators/jpegcodec.py`` (VERDICT r7 #5 / r8 #4 / r9 #4:
the production codec was validated only by round-trips against its own
matching encoder, so a shared misreading of the spec would attest as
"correct"; this module shares NO code, tables, or derivations with it).

Everything here is written directly from ITU-T T.81 (the public JPEG
spec) + the JFIF colorspace note:

- the zigzag sequence is the LITERAL 64-entry table from T.81 Figure 5
  (production derives it algorithmically — the table cross-checks the
  derivation);
- Huffman tables are built by the Annex C canonical procedure
  (Generate_size_table / Generate_code_table), not by sorted-symbol
  assignment;
- DC/AC entropy decoding follows the Annex F procedures DECODE,
  RECEIVE, EXTEND verbatim, including the F.2.2.1 EXTEND sign rule;
- the IDCT is the DIRECT FORM of T.81 A.3.3:
      f(x,y) = 1/4 * sum_u sum_v C(u) C(v) F(u,v)
                 * cos((2x+1)u*pi/16) * cos((2y+1)v*pi/16)
  computed from per-axis cosine tables built with math.cos — not the
  orthonormal-matrix sandwich the production decoder uses;
- chroma upsampling is sample replication and YCbCr->RGB is the JFIF
  BT.601 float mapping; rounding is round-half-even in BOTH decoders
  (the one convention that must be shared for pixel comparison).

Decoder scope = baseline sequential DCT (SOF0), 8-bit, 1 or 3
components, optional restart markers — the envelope the production
ENCODER emits, which is the differential fixture generator.
"""

import math
import struct

import numpy as np

# T.81 Figure 5: zigzag scan order as natural-order indices, row by
# row of the figure — a hand-transcribed literal, NOT derived.
ZIGZAG_T81 = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# A.3.3 cosine table: COS[u][x] = C(u) * cos((2x+1) u pi / 16)
_COS = [
    [
        (1.0 / math.sqrt(2.0) if u == 0 else 1.0)
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]


def idct_direct(F):
    """T.81 A.3.3 direct-form IDCT of one 8x8 coefficient block
    (natural order), float64, level-shifted +128, UNclipped."""
    out = np.empty((8, 8), dtype=np.float64)
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                cv = _COS[v][y]
                for u in range(8):
                    s += _COS[u][x] * cv * F[v][u]
            out[y, x] = s / 4.0 + 128.0
    return out


class _Huff:
    """Annex C canonical Huffman table + Annex F DECODE."""

    def __init__(self, bits, vals):
        # C.2 Generate_size_table / C.3 Generate_code_table
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        self.vals = list(vals)
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.val_ptr[length] = k
                self.min_code[length] = code
                code += n
                k += n
                self.max_code[length] = code - 1
            code <<= 1

    def decode(self, br):
        # F.2.2.3 DECODE procedure
        code = br.next_bit()
        length = 1
        while code > self.max_code[length]:
            length += 1
            if length > 16:
                raise ValueError("naive jpeg: invalid Huffman code")
            code = (code << 1) | br.next_bit()
        return self.vals[self.val_ptr[length] + code - self.min_code[length]]


class _ScanBits:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    stuffing; stops AT (does not consume past) any real marker."""

    def __init__(self, data, pos):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def next_bit(self):
        if self.nbits == 0:
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2  # stuffed 0xFF data byte
                else:
                    raise ValueError("naive jpeg: hit marker inside scan")
            else:
                self.pos += 1
            self.cur = b
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n):  # F.2.2.4 RECEIVE
        v = 0
        for _ in range(n):
            v = (v << 1) | self.next_bit()
        return v

    def align_and_expect_rst(self, n):
        """Byte-align then consume the RSTn marker (F.2.1.3.1)."""
        self.nbits = 0
        if not (
            self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xD0 + (n % 8)
        ):
            raise ValueError("naive jpeg: expected RST marker")
        self.pos += 2


def _extend(v, t):
    # F.2.2.1 EXTEND: V < 2^(T-1)  ->  V - (2^T - 1)
    if t == 0:
        return 0
    if v < (1 << (t - 1)):
        return v - (1 << t) + 1
    return v


def decode_jpeg_naive(b: bytes) -> np.ndarray:
    """Decode a baseline JFIF JPEG to (h, w) gray or (h, w, 3) RGB
    uint8. Raises on anything outside baseline SOF0 scope."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("naive jpeg: no SOI")
    pos = 2
    qt = {}
    dc_tabs = {}
    ac_tabs = {}
    frame = None
    dri = 0
    while True:
        if b[pos] != 0xFF:
            raise ValueError("naive jpeg: expected marker")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("naive jpeg: EOI before scan")
        seg_len = struct.unpack(">H", b[pos : pos + 2])[0]
        body = b[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT — B.2.4.1
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("naive jpeg: 16-bit quant table")
                tab = np.zeros(64, dtype=np.int64)
                for k in range(64):
                    tab[ZIGZAG_T81[k]] = body[i + 1 + k]
                qt[tq] = tab
                i += 65
        elif marker == 0xC4:  # DHT — B.2.4.2
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _Huff(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 — B.2.2
            prec = body[0]
            if prec != 8:
                raise ValueError("naive jpeg: not 8-bit")
            h, w = struct.unpack(">HH", body[1:5])
            nf = body[5]
            comps = []
            for ci in range(nf):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("naive jpeg: non-baseline frame")
        elif marker == 0xDD:  # DRI
            dri = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — decode follows
            ns = body[0]
            sel = []
            for ci in range(ns):
                cs, tt = body[1 + 2 * ci], body[2 + 2 * ci]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                sel.append((comp, tt >> 4, tt & 0x0F))
            pos += seg_len
            return _decode_scan_pixels(
                b, pos, frame, sel, qt, dc_tabs, ac_tabs, dri
            )
        pos += seg_len


def _decode_scan_pixels(b, pos, frame, sel, qt, dc_tabs, ac_tabs, dri):
    h, w = frame["h"], frame["w"]
    comps = [c for c, _, _ in sel]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    coef = {
        c["id"]: np.zeros(
            (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int64
        )
        for c in comps
    }
    br = _ScanBits(b, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_i and mcu_i % dri == 0:
                br.align_and_expect_rst(mcu_i // dri - 1)
                pred = {c["id"]: 0 for c in comps}
            mcu_i += 1
            for comp, td, ta in sel:
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        # F.2.2.1 DC
                        t = dc_tabs[td].decode(br)
                        diff = _extend(br.receive(t), t)
                        pred[comp["id"]] += diff
                        blk[0] = pred[comp["id"]]
                        # F.2.2.2 AC
                        k = 1
                        while k <= 63:
                            rs = ac_tabs[ta].decode(br)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            blk[k] = _extend(br.receive(s), s)
                            k += 1
                        coef[comp["id"]][
                            my * comp["v"] + by, mx * comp["h"] + bx
                        ] = blk
    planes = []
    for c in comps:
        grid = coef[c["id"]]
        bh, bw_ = grid.shape[:2]
        plane = np.empty((bh * 8, bw_ * 8), dtype=np.float64)
        q = qt[c["tq"]]
        for by in range(bh):
            for bx in range(bw_):
                F = np.zeros((8, 8), dtype=np.float64)
                zz = grid[by, bx]
                for k in range(64):
                    nat = ZIGZAG_T81[k]
                    F[nat // 8][nat % 8] = zz[k] * q[nat]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = idct_direct(F)
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, bl], axis=-1)), 0, 255
    ).astype(np.uint8)
