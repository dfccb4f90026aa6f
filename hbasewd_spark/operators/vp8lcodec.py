"""WebP-lossless (VP8L) codec — numpy + stdlib only.

The second half of the transform-codec seam (the first, baseline JPEG,
is :mod:`.jpegcodec`): a complete decoder for the VP8L lossless
bitstream — LSB-first bit reading, simple and code-length-coded
canonical Huffman trees, the five-code entropy image (green+length+
cache / red / blue / alpha / distance), LZ77 backward references with
the 120-entry 2-D distance neighborhood map, color cache, meta-Huffman
groups, and all four transforms (predictor with its 14 modes, color
transform, subtract-green, color indexing incl. sub-byte pixel
packing) applied inverse in reverse read order — plus a matching
encoder used by the roundtrip tests (configurable: literals or LZ77,
color cache, simple or full trees, subtract-green / fixed-mode
predictor / palette transforms).

Scope, stated loudly:
- VP8L lossless streams (the ``VP8L`` RIFF chunk): DECODED to RGBA;
- lossy VP8 and VP8X-wrapped composites: NOT decoded —
  :func:`decode_webp` returns ``None`` and callers keep the
  header-only metadata path (:func:`multimodal.parse_webp_header`).

Conformance caveat, recorded honestly: no reference WebP
implementation or conformance vectors exist in this container, so the
spec-fixed constants (code-length-code order, distance map) are
transcribed from the public VP8L specification and verified by
encoder/decoder roundtrips plus structural unit pins — not against
libwebp output. The per-pixel entropy loop is plain Python: right for
unit-scale payloads; production rasters swap in libwebp (the
documented seam, same as JPEG's).
"""

from __future__ import annotations

import heapq

import numpy as np

# code-length-code read order (VP8L spec §5.2.2)
KORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# 2-D distance neighborhood: codes 1..120 map to (dx, dy) offsets
# (VP8L spec §4.2.2); plain distances continue past 120.
DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]

VP8L_MAX_PIXELS = 1 << 24  # same bomb-guard stance as the JPEG/PNG paths


# ----------------------------------------------------------- bit I/O
class _BR:
    """LSB-first bit reader (VP8L bit order, unlike JPEG's)."""

    def __init__(self, data: bytes):
        self.data = data
        self.byte = 0
        self.bit = 0

    def read_bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.byte >= len(self.data):
                raise EOFError("vp8l bitstream exhausted")
            v |= ((self.data[self.byte] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_sym(self, dmap: dict) -> int:
        if (0, 0) in dmap:  # 0-bit (single-symbol) code
            return dmap[(0, 0)]
        code = length = 0
        while length < 16:
            code = (code << 1) | self.read_bits(1)
            length += 1
            sym = dmap.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid vp8l huffman code")


class _BW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write_bits(self, v: int, n: int) -> None:  # LSB-first
        for i in range(n):
            self.acc |= ((v >> i) & 1) << self.n
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def write_code(self, code: int, length: int) -> None:  # MSB-first
        for i in range(length - 1, -1, -1):
            self.write_bits((code >> i) & 1, 1)

    def finish(self) -> bytes:
        if self.n:
            self.out.append(self.acc)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


# --------------------------------------------------- canonical codes
def _canonical(lengths: list[int]):
    """lengths -> (decode map {(len, code): sym}, encode map
    {sym: (code, len)}), canonical assignment (ascending length, then
    ascending symbol — the DEFLATE/VP8L rule). A single-symbol code is
    a 0-bit code."""
    syms = [s for s, l in enumerate(lengths) if l > 0]
    if not syms:
        raise ValueError("empty huffman code")
    if len(syms) == 1:
        return {(0, 0): syms[0]}, {syms[0]: (0, 0)}
    order = sorted(syms, key=lambda s: (lengths[s], s))
    dmap, emap = {}, {}
    code, prev_len = 0, lengths[order[0]]
    for s in order:
        code <<= lengths[s] - prev_len
        prev_len = lengths[s]
        dmap[(lengths[s], code)] = s
        emap[s] = (code, lengths[s])
        code += 1
    return dmap, emap


def _huff_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Huffman code lengths from frequencies (encoder side). Depth is
    naturally shallow for unit-scale alphabets; lengths past max_len
    are flattened by frequency-damping retries."""
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    damp = 1
    while True:
        heap = [(max(f // damp, 1), s, (s,)) for s, f in freqs.items()]
        heapq.heapify(heap)
        parents: dict[int, int] = {s: 0 for s in freqs}
        while len(heap) > 1:
            fa, _, la = heapq.heappop(heap)
            fb, tb, lb = heapq.heappop(heap)
            for s in la + lb:
                parents[s] += 1
            heapq.heappush(heap, (fa + fb, tb, la + lb))
        if max(parents.values()) <= max_len:
            return parents
        damp *= 4


# ------------------------------------------------- huffman code read
def _read_code(br: _BR, alphabet: int) -> dict:
    """One Huffman code (VP8L spec §5.2.1/§5.2.2): simple (1-2
    symbols) or code-length-coded."""
    if br.read_bits(1):  # simple
        num = br.read_bits(1) + 1
        first_8 = br.read_bits(1)
        s0 = br.read_bits(8 if first_8 else 1)
        lengths = [0] * alphabet
        if num == 1:
            if s0 >= alphabet:
                raise ValueError("simple code symbol out of range")
            return {(0, 0): s0}
        s1 = br.read_bits(8)
        if s0 >= alphabet or s1 >= alphabet or s0 == s1:
            raise ValueError("bad simple code")
        # simple codes assign by STREAM order: first symbol -> code 0
        return {(1, 0): s0, (1, 1): s1}
    num_cl = 4 + br.read_bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[KORDER[i]] = br.read_bits(3)
    cl_map = _canonical(cl_lengths)[0]
    # optional symbol-count limit
    if br.read_bits(1):
        length_nbits = 2 + 2 * br.read_bits(3)
        max_symbol = 2 + br.read_bits(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = br.read_sym(cl_map)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read_bits(2)
            for _ in range(rep):
                if i < alphabet:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.read_bits(3)
        else:  # 18
            i += 11 + br.read_bits(7)
    if i > alphabet:
        raise ValueError("code lengths overflow alphabet")
    return _canonical(lengths)[0]


def _prefix_val(br: _BR, code: int) -> int:
    """Prefix-coded length/distance value (spec §4.2.1)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read_bits(extra) + 1


# ------------------------------------------------------ image decode
def _decode_image(br: _BR, xsize: int, ysize: int, level0: bool):
    """Spatially-coded image -> (flat uint32 ARGB ndarray, transforms
    list). Transforms only at level 0; sub-images recurse with
    level0=False."""
    transforms = []
    w = xsize
    if level0:
        seen = set()
        while br.read_bits(1):
            ttype = br.read_bits(2)
            if ttype in seen:
                raise ValueError("duplicate transform")
            seen.add(ttype)
            # each tuple carries the width AT ITS PIPELINE POINT (the
            # width its inverse runs at / produces), so stacked
            # transforms around color-indexing invert at the right
            # geometry
            if ttype == 0 or ttype == 1:  # predictor / color transform
                bits = br.read_bits(3) + 2
                bw = -(-w // (1 << bits))
                bh = -(-ysize // (1 << bits))
                sub, _ = _decode_image(br, bw, bh, False)
                transforms.append((ttype, bits, sub, w))
            elif ttype == 2:  # subtract green
                transforms.append((2, None, None, w))
            else:  # color indexing
                n_colors = br.read_bits(8) + 1
                pal, _ = _decode_image(br, n_colors, 1, False)
                # delta-coded palette: per-channel cumulative sum
                p = pal.view(np.uint8).reshape(-1, 4)
                pal = np.cumsum(p.astype(np.uint16), axis=0).astype(
                    np.uint8
                ).copy().view(np.uint32).ravel()
                if n_colors <= 2:
                    wbits = 3
                elif n_colors <= 4:
                    wbits = 2
                elif n_colors <= 16:
                    wbits = 1
                else:
                    wbits = 0
                transforms.append((3, (n_colors, wbits), pal, w))
                if wbits:
                    w = -(-w // (1 << wbits))  # packed width

    cache_bits = br.read_bits(4) if br.read_bits(1) else 0
    if cache_bits > 11:
        raise ValueError("bad color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta = None
    hbits = 0
    n_groups = 1
    if level0 and br.read_bits(1):  # meta huffman image
        hbits = br.read_bits(3) + 2
        mw = -(-w // (1 << hbits))
        mh = -(-ysize // (1 << hbits))
        meta_img, _ = _decode_image(br, mw, mh, False)
        # group index = (red << 8) | green
        meta = (
            ((meta_img >> 16) & 0xFF) << 8 | ((meta_img >> 8) & 0xFF)
        ).astype(np.int64)
        n_groups = int(meta.max()) + 1
        meta_w = mw
    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_code(br, green_alpha),
                _read_code(br, 256),
                _read_code(br, 256),
                _read_code(br, 256),
                _read_code(br, 40),
            )
        )

    n_px = w * ysize
    out = np.zeros(n_px, dtype=np.uint32)
    pos = 0
    g_codes = groups[0]
    while pos < n_px:
        if meta is not None:
            x, y = pos % w, pos // w
            g_codes = groups[
                int(meta[(y >> hbits) * meta_w + (x >> hbits)])
            ]
        gc, rc, bc, ac, dc = g_codes
        s = br.read_sym(gc)
        if s < 256:  # literal
            r = br.read_sym(rc)
            b = br.read_sym(bc)
            a = br.read_sym(ac)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            if cache_size:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif s < 256 + 24:  # backward reference
            length = _prefix_val(br, s - 256)
            dist_code = _prefix_val(br, br.read_sym(dc))
            if dist_code <= 120:
                dx, dy = DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            if dist > pos or pos + length > n_px:
                raise ValueError("backward reference out of range")
            for i in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache_size:
                    cache[
                        (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
                pos += 1
        else:  # color cache hit
            if not cache_size:
                raise ValueError("cache symbol without cache")
            out[pos] = cache[s - 256 - 24]
            pos += 1
    return out, transforms


# -------------------------------------------------------- transforms
def _avg2(a, b):
    return ((a.astype(np.uint16) + b) >> 1).astype(np.uint8)


def _predict(mode: int, L, T, TL, TR) -> np.ndarray:
    """One predicted pixel (4 uint8 channels) from neighbors."""
    if mode == 0:
        return np.array([0xFF, 0, 0, 0], np.uint8)  # ARGB opaque black
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select
        p = L.astype(np.int32) + T - TL
        pl = np.abs(p - L).sum()
        pt = np.abs(p - T).sum()
        return L if pl < pt else T
    if mode == 12:  # ClampAddSubtractFull
        return np.clip(L.astype(np.int32) + T - TL, 0, 255).astype(np.uint8)
    if mode == 13:  # ClampAddSubtractHalf
        a = _avg2(L, T).astype(np.int32)
        return np.clip(a + ((a - TL) >> 1), 0, 255).astype(np.uint8)
    raise ValueError(f"bad predictor mode {mode}")


def _inv_predictor(px: np.ndarray, w: int, h: int, bits: int, sub) -> None:
    """In-place inverse predictor transform over the (h*w, 4) uint8
    channel view (ARGB order)."""
    bw = -(-w // (1 << bits))
    modes = ((sub >> 8) & 0xFF).astype(np.int64)  # green channel
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = _predict(0, None, None, None, None)
        elif y == 0:
            pred = px[pos - 1]
        elif x == 0:
            pred = px[pos - w]
        else:
            mode = int(modes[(y >> bits) * bw + (x >> bits)])
            L = px[pos - 1]
            T = px[pos - w]
            TL = px[pos - w - 1]
            TR = px[pos - w + 1]  # rightmost col: first px of this row
            pred = _predict(mode, L, T, TL, TR)
        px[pos] = px[pos] + pred  # uint8 wraparound add


def _signed(v):
    return v.astype(np.int8).astype(np.int32)


def _i8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _inv_color_transform(px: np.ndarray, w: int, h: int, bits: int, sub) -> None:
    """In-place inverse color transform (spec §3.5): red gains a
    green-scaled delta, blue gains green- and (new) red-scaled deltas;
    multipliers are 3.5 fixed-point signed bytes from the sub-image."""
    bw = -(-w // (1 << bits))
    # cte pixel layout: green_to_red in BLUE, green_to_blue in GREEN,
    # red_to_blue in RED (spec §3.5 ColorTransformElement packing)
    g2r = _signed(sub & 0xFF)
    g2b = _signed((sub >> 8) & 0xFF)
    r2b = _signed((sub >> 16) & 0xFF)
    for pos in range(w * h):
        x, y = pos % w, pos // w
        bi = (y >> bits) * bw + (x >> bits)
        r, g, b = int(px[pos, 1]), int(px[pos, 2]), int(px[pos, 3])
        gs = _i8(g)
        r = (r + ((int(g2r[bi]) * gs) >> 5)) & 0xFF
        b = (b + ((int(g2b[bi]) * gs) >> 5) + ((int(r2b[bi]) * _i8(r)) >> 5)) & 0xFF
        px[pos, 1] = r
        px[pos, 3] = b


def _apply_inverse_transforms(flat, transforms, h):
    """Returns flat uint32 ARGB at full resolution. Each transform
    tuple carries the width its inverse runs at."""
    for ttype, arg, sub, tw in reversed(transforms):
        if ttype == 3:  # color indexing: unpack + palette lookup
            n_colors, wbits = arg
            if wbits:
                packed_w = -(-tw // (1 << wbits))
                idx = np.zeros(tw * h, dtype=np.int64)
                green = (flat >> 8) & 0xFF
                per = 1 << wbits
                bits_per = 8 >> wbits
                mask = (1 << bits_per) - 1
                for y in range(h):
                    for x in range(tw):
                        p = green[y * packed_w + (x >> wbits)]
                        idx[y * tw + x] = (p >> ((x % per) * bits_per)) & mask
            else:
                idx = ((flat >> 8) & 0xFF).astype(np.int64)
            if int(idx.max(initial=0)) >= len(sub):
                raise ValueError("palette index out of range")
            flat = sub[idx]
        elif ttype == 2:  # add green
            ch = np.ascontiguousarray(flat).view(np.uint8).reshape(-1, 4)
            g = ch[:, 1].copy()  # little-endian uint32: B,G,R,A
            ch[:, 0] += g  # blue
            ch[:, 2] += g  # red
            flat = ch.view(np.uint32).ravel()
        elif ttype == 0:  # predictor
            argb = _argb_channels(flat)
            _inv_predictor(argb, tw, h, arg, sub)
            flat = _from_argb_channels(argb)
        elif ttype == 1:  # color transform
            argb = _argb_channels(flat)
            _inv_color_transform(argb, tw, h, arg, sub)
            flat = _from_argb_channels(argb)
    return flat


def _argb_channels(flat: np.ndarray) -> np.ndarray:
    """uint32 ARGB -> (n, 4) uint8 in A,R,G,B order."""
    return np.stack(
        [
            (flat >> 24) & 0xFF,
            (flat >> 16) & 0xFF,
            (flat >> 8) & 0xFF,
            flat & 0xFF,
        ],
        axis=1,
    ).astype(np.uint8)


def _from_argb_channels(ch: np.ndarray) -> np.ndarray:
    c = ch.astype(np.uint32)
    return (c[:, 0] << 24) | (c[:, 1] << 16) | (c[:, 2] << 8) | c[:, 3]


# ------------------------------------------------------- public API
def decode_vp8l(payload: bytes) -> np.ndarray | None:
    """Decode a VP8L chunk payload to an (h, w, 4) RGBA uint8 array,
    or None outside the supported/valid envelope."""
    try:
        if len(payload) < 5 or payload[0] != 0x2F:
            return None
        br = _BR(payload[1:])
        w = br.read_bits(14) + 1
        h = br.read_bits(14) + 1
        br.read_bits(1)  # alpha hint
        if br.read_bits(3) != 0:  # version
            return None
        if w * h > VP8L_MAX_PIXELS:
            return None
        flat, transforms = _decode_image(br, w, h, True)
        flat = _apply_inverse_transforms(flat, transforms, h)
        if len(flat) != w * h:
            raise ValueError("decoded size mismatch")
        argb = _argb_channels(flat).reshape(h, w, 4)
        return argb[..., [1, 2, 3, 0]].copy()  # ARGB -> RGBA
    except (ValueError, EOFError, IndexError, KeyError):
        return None


def decode_webp(b: bytes) -> np.ndarray | None:
    """RIFF wrapper -> :func:`decode_vp8l` for lossless files; lossy
    VP8 and extended VP8X return None (header-only path)."""
    if len(b) < 20 or b[0:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    if b[12:16] != b"VP8L":
        return None
    size = int.from_bytes(b[16:20], "little")
    return decode_vp8l(b[20 : 20 + size])


# =============================================================== encoder
def _prefix_code(v: int) -> tuple[int, int, int]:
    """Inverse of :func:`_prefix_val`: value -> (code, extra_bits,
    extra_value)."""
    if v < 1:
        raise ValueError("prefix value must be >= 1")
    if v <= 4:
        return v - 1, 0, 0
    for code in range(4, 40):
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        lo, hi = offset + 1, offset + (1 << extra)
        if lo <= v <= hi:
            return code, extra, v - lo
    raise ValueError(f"prefix value {v} out of range")


def _write_tree(bw: _BW, lengths: list[int]):
    """Serialize one Huffman code: simple form for <=2 symbols, else
    the code-length-coded form (exercising 17/18 zero-run repeats)."""
    syms = [s for s, l in enumerate(lengths) if l > 0]
    if len(syms) <= 2 and all(s < 256 for s in syms) and syms:
        bw.write_bits(1, 1)  # simple
        bw.write_bits(len(syms) - 1, 1)
        first_8 = 1 if syms[0] > 1 else 0
        bw.write_bits(first_8, 1)
        bw.write_bits(syms[0], 8 if first_8 else 1)
        if len(syms) == 2:
            bw.write_bits(syms[1], 8)
        return
    bw.write_bits(0, 1)  # full form
    # tokenize lengths with zero-run codes
    tokens: list[tuple[int, int, int]] = []  # (symbol, extra_bits, extra)
    i = 0
    while i < len(lengths):
        if lengths[i] == 0:
            j = i
            while j < len(lengths) and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                chunk = min(run, 138)
                tokens.append((18, 7, chunk - 11))
                run -= chunk
            while run >= 3:
                chunk = min(run, 10)
                tokens.append((17, 3, chunk - 3))
                run -= chunk
            tokens.extend((0, 0, 0) for _ in range(run))
            i = j
        else:
            tokens.append((lengths[i], 0, 0))
            i += 1
    freqs: dict[int, int] = {}
    for t, _, _ in tokens:
        freqs[t] = freqs.get(t, 0) + 1
    cl_lengths_map = _huff_lengths(freqs, max_len=7)
    cl_lengths = [0] * 19
    for s, l in cl_lengths_map.items():
        cl_lengths[s] = l
    _, cl_emap = _canonical(cl_lengths)
    bw.write_bits(15, 4)  # num_code_lengths = 19: write all, in KORDER
    for s in KORDER:
        bw.write_bits(cl_lengths[s], 3)
    bw.write_bits(0, 1)  # no max_symbol limit
    for t, ebits, extra in tokens:
        code, ln = cl_emap[t]
        bw.write_code(code, ln)
        if ebits:
            bw.write_bits(extra, ebits)


def _emit_symbols(flat, w, h, cache_bits, use_lz77, map_dist):
    """Raster pass -> (symbol stream, per-code histograms). Symbols:
    ('lit', g, r, b, a) | ('len', code, ebits, extra, dcode, debits,
    dextra) | ('cache', idx)."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size
    n = len(flat)
    out = []
    hist = [dict() for _ in range(5)]

    def bump(i, s):
        hist[i][s] = hist[i].get(s, 0) + 1

    def insert(px):
        if cache_size:
            cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    pos = 0
    while pos < n:
        px = int(flat[pos])
        if use_lz77 and pos > 0 and px == int(flat[pos - 1]):
            run = 1
            while (
                pos + run < n
                and run < 4096
                and int(flat[pos + run]) == int(flat[pos + run - 1])
            ):
                run += 1
            if run >= 3:
                code, ebits, extra = _prefix_code(run)
                if map_dist:
                    dcode, debits, dextra = _prefix_code(2)  # map (1,0) -> 1
                else:
                    dcode, debits, dextra = _prefix_code(121)  # plain 1
                out.append(("len", code, ebits, extra, dcode, debits, dextra))
                bump(0, 256 + code)
                bump(4, dcode)
                for i in range(run):
                    insert(int(flat[pos + i]))
                pos += run
                continue
        key = (
            (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache_size
            else 0
        )
        if cache_size and cache[key] == px:
            out.append(("cache", key))
            bump(0, 256 + 24 + key)
            pos += 1
            continue
        a, r, g, b = px >> 24 & 0xFF, px >> 16 & 0xFF, px >> 8 & 0xFF, px & 0xFF
        out.append(("lit", g, r, b, a))
        bump(0, g)
        bump(1, r)
        bump(2, b)
        bump(3, a)
        insert(px)
        pos += 1
    return out, hist


def _write_trees(bw, hist, cache_size):
    """Write one group's five Huffman codes; return encode maps."""
    alphabets = [256 + 24 + cache_size, 256, 256, 256, 40]
    emaps = []
    for i, alpha in enumerate(alphabets):
        freqs = hist[i] or {0: 1}  # unused code: 1-symbol placeholder
        lmap = _huff_lengths(freqs) if len(freqs) > 1 else {next(iter(freqs)): 1}
        if len(freqs) == 1:
            # canonical 1-symbol code is 0-bit; serialize as simple
            lengths = [0] * alpha
            lengths[next(iter(freqs))] = 1
            only = next(iter(freqs))
            if only < 256:
                _write_tree(bw, lengths)
                emaps.append({only: (0, 0)})
                continue
            # symbol >= 256 can't ride the simple form: add a dummy
            # 0-symbol so the full form applies
            lmap = {only: 1, 0: 1}
        lengths = [0] * alpha
        for s, l in lmap.items():
            lengths[s] = l
        _write_tree(bw, lengths)
        emaps.append(_canonical(lengths)[1])
    return emaps


def _write_image_meta2(bw, flat, w, h, meta_bits):
    """Main image with a TWO-group meta-Huffman image (group =
    x-block parity), literals only — exercises the decoder's
    meta-group machinery end to end."""
    bw.write_bits(0, 1)  # no color cache
    bw.write_bits(1, 1)  # meta image present
    bw.write_bits(meta_bits - 2, 3)
    mw = -(-w // (1 << meta_bits))
    mh = -(-h // (1 << meta_bits))
    meta = np.fromfunction(
        lambda y, x: (x % 2).astype(np.uint32), (mh, mw), dtype=np.int64
    ).ravel()
    # group index rides (red<<8)|green -> store in green
    _write_image(bw, 0xFF000000 | (meta << 8), mw, mh, False)
    groups = [(x >> meta_bits) % 2 for x in range(w)]
    hists = [[dict() for _ in range(5)] for _ in range(2)]
    for pos in range(w * h):
        g_i = groups[pos % w]
        px = int(flat[pos])
        a, r, g, b = px >> 24 & 0xFF, px >> 16 & 0xFF, px >> 8 & 0xFF, px & 0xFF
        for i, s in ((0, g), (1, r), (2, b), (3, a)):
            hists[g_i][i][s] = hists[g_i][i].get(s, 0) + 1
    emaps = [_write_trees(bw, hi, 0) for hi in hists]
    for pos in range(w * h):
        gmap, rmap, bmap, amap, _ = emaps[groups[pos % w]]
        px = int(flat[pos])
        a, r, g, b = px >> 24 & 0xFF, px >> 16 & 0xFF, px >> 8 & 0xFF, px & 0xFF
        bw.write_code(*gmap[g])
        bw.write_code(*rmap[r])
        bw.write_code(*bmap[b])
        bw.write_code(*amap[a])


def _write_image(bw, flat, w, h, level0, cache_bits=0, use_lz77=False, map_dist=False):
    """One spatially-coded image (main or sub)."""
    if cache_bits:
        bw.write_bits(1, 1)
        bw.write_bits(cache_bits, 4)
    else:
        bw.write_bits(0, 1)
    if level0:
        bw.write_bits(0, 1)  # no meta-huffman image
    cache_size = (1 << cache_bits) if cache_bits else 0
    syms, hist = _emit_symbols(flat, w, h, cache_bits, use_lz77, map_dist)
    gmap, rmap, bmap, amap, dmap = _write_trees(bw, hist, cache_size)
    for s in syms:
        if s[0] == "lit":
            _, g, r, b, a = s
            bw.write_code(*gmap[g])
            bw.write_code(*rmap[r])
            bw.write_code(*bmap[b])
            bw.write_code(*amap[a])
        elif s[0] == "len":
            _, code, ebits, extra, dcode, debits, dextra = s
            bw.write_code(*gmap[256 + code])
            if ebits:
                bw.write_bits(extra, ebits)
            bw.write_code(*dmap[dcode])
            if debits:
                bw.write_bits(dextra, debits)
        else:
            bw.write_code(*gmap[256 + 24 + s[1]])


def _fwd_predictor(flat, w, h, mode, bits):
    """Forward predictor with one fixed mode: residual = px - pred,
    predictions from ORIGINAL neighbors (what the decoder will have
    reconstructed), border rules as the decoder's."""
    src = _argb_channels(flat)
    res = src.copy()
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = _predict(0, None, None, None, None)
        elif y == 0:
            pred = src[pos - 1]
        elif x == 0:
            pred = src[pos - w]
        else:
            pred = _predict(
                mode, src[pos - 1], src[pos - w], src[pos - w - 1],
                src[pos - w + 1],
            )
        res[pos] = src[pos] - pred  # uint8 wraparound
    sub_w = -(-w // (1 << bits))
    sub_h = -(-h // (1 << bits))
    sub = np.full(sub_w * sub_h, 0xFF000000 | (mode << 8), dtype=np.uint32)
    return _from_argb_channels(res), sub


def _fwd_color_transform(flat, w, h, g2r, g2b, r2b, bits):
    """Forward color transform with one constant element."""
    ch = _argb_channels(flat)
    for pos in range(w * h):
        r, g, b = int(ch[pos, 1]), int(ch[pos, 2]), int(ch[pos, 3])
        gs = _i8(g)
        nr = (r - ((_i8(g2r) * gs) >> 5)) & 0xFF
        nb = (b - ((_i8(g2b) * gs) >> 5) - ((_i8(r2b) * _i8(r)) >> 5)) & 0xFF
        ch[pos, 1] = nr
        ch[pos, 3] = nb
    sub_w = -(-w // (1 << bits))
    sub_h = -(-h // (1 << bits))
    # multipliers are signed 3.5 fixed-point BYTES: mask before packing
    # so callers may spell them signed (-25) or unsigned (231) — a
    # negative int OR'd unmasked corrupts every higher field of the
    # cte word (caught by the r10 differential suite)
    cte = 0xFF000000 | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF)
    return _from_argb_channels(ch), np.full(sub_w * sub_h, cte, dtype=np.uint32)


def encode_vp8l(
    rgba: np.ndarray,
    use_lz77: bool = True,
    cache_bits: int = 0,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    palette: bool = False,
    map_dist: bool = False,
    transform_bits: int = 4,
    meta_groups: int = 1,
) -> bytes:
    """Encode an (h, w, 3|4) uint8 array as a lossless WebP file.

    Test-grade encoder: spec-compliant output exercising the decoder's
    paths (LZ77 runs via plain or 2-D-mapped distance-1, color cache,
    simple and code-length-coded trees, subtract-green / fixed-mode
    predictor / constant color-transform / palette transforms). Not a
    compressor — it makes VALID streams, not small ones."""
    px = np.asarray(rgba)
    h, w = px.shape[:2]
    if px.ndim == 2:
        px = np.stack([px] * 3, axis=-1)
    if px.shape[2] == 3:
        alpha = np.full((h, w, 1), 255, np.uint8)
        px = np.concatenate([px, alpha], axis=-1)
    c = px.reshape(-1, 4).astype(np.uint32)
    flat = (c[:, 3] << 24) | (c[:, 0] << 16) | (c[:, 1] << 8) | c[:, 2]  # ARGB

    bw = _BW()
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(int((px[..., 3] != 255).any()), 1)
    bw.write_bits(0, 3)  # version

    ew = w  # entropy-image width after forward transforms
    headers: list[tuple] = []
    if predictor_mode is not None:
        flat, sub = _fwd_predictor(flat, ew, h, predictor_mode, transform_bits)
        headers.append((0, sub))
    if color_transform is not None:
        flat, sub = _fwd_color_transform(flat, ew, h, *color_transform, transform_bits)
        headers.append((1, sub))
    if subtract_green:
        ch = _argb_channels(flat)
        g = ch[:, 2].copy()
        ch[:, 1] -= g
        ch[:, 3] -= g
        flat = _from_argb_channels(ch)
        headers.append((2, None))
    if palette:
        colors, inverse = np.unique(flat, return_inverse=True)
        if len(colors) > 256:
            raise ValueError("palette transform needs <=256 distinct colors")
        n_colors = len(colors)
        if n_colors <= 2:
            wbits = 3
        elif n_colors <= 4:
            wbits = 2
        elif n_colors <= 16:
            wbits = 1
        else:
            wbits = 0
        idx = inverse.reshape(h, w)
        if wbits:
            per = 1 << wbits
            bits_per = 8 >> wbits
            pw = -(-w // per)
            packed = np.zeros((h, pw), dtype=np.uint32)
            for y in range(h):
                for x in range(w):
                    packed[y, x >> wbits] |= int(idx[y, x]) << ((x % per) * bits_per)
            green = packed.ravel()
            ew = pw
        else:
            green = idx.ravel().astype(np.uint32)
        flat = 0xFF000000 | (green << 8)
        headers.append((3, (n_colors, colors)))

    for ttype, arg in headers:
        bw.write_bits(1, 1)
        bw.write_bits(ttype, 2)
        if ttype in (0, 1):
            bw.write_bits(transform_bits - 2, 3)
            sw = -(-ew // (1 << transform_bits))
            sh = -(-h // (1 << transform_bits))
            _write_image(bw, arg, sw, sh, False)
        elif ttype == 3:
            n_colors, colors = arg
            bw.write_bits(n_colors - 1, 8)
            chc = _argb_channels(colors.astype(np.uint32))
            deltas = chc.copy()
            deltas[1:] = chc[1:] - chc[:-1]  # uint8 wraparound
            _write_image(
                bw, _from_argb_channels(deltas), n_colors, 1, False
            )
    bw.write_bits(0, 1)  # end of transforms

    if meta_groups == 2:
        _write_image_meta2(bw, flat, ew, h, meta_bits=3)
    else:
        _write_image(
            bw, flat, ew, h, True,
            cache_bits=cache_bits, use_lz77=use_lz77, map_dist=map_dist,
        )
    payload = b"\x2f" + bw.finish()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunk += b"\x00"  # RIFF even-size padding
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff
