"""Spec-literal VP8L (WebP lossless) decoder — the DIFFERENTIAL
REFERENCE for ``hbasewd_spark/operators/vp8lcodec.py`` (VERDICT r9 #4:
the production codec was validated by round-trips against its own
matching encoder; this module shares no code with either side and is
written bit-by-bit from the public WebP lossless bitstream spec /
RFC 9649).

Deliberately naive implementation choices (clarity over speed — test
images are tiny):

- pixels are (A, R, G, B) int tuples in a flat Python list;
- prefix codes are decoded by one-bit tree walking over a canonical
  code built with the RFC 1951 `next_code` COUNTING algorithm (the
  production decoder assigns codes by walking symbols sorted by
  (length, symbol) — two independent constructions of the same
  canon);
- the 120-entry 2-D distance map is GENERATED from its geometric
  definition (the 8-wide search window ordered by squared distance,
  then larger dy first, then smaller |dx|, positive before negative)
  rather than transcribed — the differential test asserts this
  derivation reproduces the production literal exactly;
- every transform inverse follows the spec pseudo-code with scalar
  arithmetic, including the int8 reinterpretations and the >>5
  arithmetic shift of the color transform.
"""


def dist_map_spec():
    """Codes 1..120 -> (dx, dy): the pixels of the 8-wide window
    {dy=0, 1<=dx<=8} + {1<=dy<=7, -7<=dx<=8} ordered by dx^2+dy^2,
    then dy descending, then |dx| ascending, then dx>0 before dx<0."""
    cand = [(dx, 0) for dx in range(1, 9)]
    for dy in range(1, 8):
        cand += [(dx, dy) for dx in range(-7, 9)]
    cand.sort(key=lambda p: (p[0] ** 2 + p[1] ** 2, -p[1], abs(p[0]), p[0] < 0))
    return cand


_DIST_MAP = dist_map_spec()

# code-length-code symbol order (spec section on prefix code groups)
_KORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class _Bits:
    """LSB-first bit reader."""

    def __init__(self, data):
        self.data = data
        self.n = 0  # absolute bit position

    def bit(self):
        byte = self.data[self.n >> 3]
        v = (byte >> (self.n & 7)) & 1
        self.n += 1
        return v

    def bits(self, k):
        v = 0
        for i in range(k):
            v |= self.bit() << i
        return v


class _Code:
    """Canonical prefix code; decode by 1-bit tree walk, codes read
    MSB-first (the Deflate convention VP8L shares)."""

    def __init__(self, lengths):
        present = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not present:
            raise ValueError("naive vp8l: empty code")
        if len(present) == 1:
            self.single = present[0][0]
            return
        self.single = None
        # RFC 1951 §3.2.2 counting construction
        maxlen = max(l for _, l in present)
        bl_count = [0] * (maxlen + 1)
        for _, l in present:
            bl_count[l] += 1
        next_code = [0] * (maxlen + 2)
        code = 0
        for l in range(1, maxlen + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        self.table = {}
        for s, l in sorted(present):
            self.table[(l, next_code[l])] = s
            next_code[l] += 1

    def read(self, br):
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        while True:
            code = (code << 1) | br.bit()
            length += 1
            if (length, code) in self.table:
                return self.table[(length, code)]
            if length > 15:
                raise ValueError("naive vp8l: bad code")


def _read_prefix_code(br, alphabet):
    if br.bit():  # simple code
        num_symbols = br.bit() + 1
        if br.bit():  # first symbol is 8 bits
            s0 = br.bits(8)
        else:
            s0 = br.bits(1)
        lengths = [0] * alphabet
        if num_symbols == 2:
            s1 = br.bits(8)
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1  # becomes the 0-bit single-symbol code
        return _Code(lengths)
    # normal: code-length code
    num_codes = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_KORDER[i]] = br.bits(3)
    cl_code = _Code(cl_lengths)
    # optional symbol-count limit
    if br.bit():
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev_len = 8
    sym = 0
    while sym < alphabet and max_symbol > 0:
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            for _ in range(3 + br.bits(2)):
                lengths[sym] = prev_len
                sym += 1
        elif cl == 17:
            sym += 3 + br.bits(3)
        else:  # 18
            sym += 11 + br.bits(7)
    return _Code(lengths)


def _prefix_lz77_val(br, code):
    """Length/distance prefix decoding (spec: 'each of these prefix
    codes ... extra bits')."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _decode_entropy_image(br, w, h, is_level0):
    """One spatially-coded ARGB image -> (pixels list, transforms).
    Transforms only at level 0."""
    transforms = []
    ew = w
    if is_level0:
        while br.bit():
            ttype = br.bits(2)
            if ttype in (0, 1):  # predictor / color
                size_bits = br.bits(3) + 2
                tw = (ew + (1 << size_bits) - 1) >> size_bits
                th = (h + (1 << size_bits) - 1) >> size_bits
                sub, _ = _decode_entropy_image(br, tw, th, False)
                transforms.append((ttype, size_bits, sub, ew))
            elif ttype == 2:  # subtract green
                transforms.append((2, None, None, ew))
            else:  # color indexing
                n_colors = br.bits(8) + 1
                deltas, _ = _decode_entropy_image(br, n_colors, 1, False)
                pal = []
                acc = (0, 0, 0, 0)
                for d in deltas:
                    acc = tuple((acc[i] + d[i]) & 0xFF for i in range(4))
                    pal.append(acc)
                if n_colors <= 2:
                    wbits = 3
                elif n_colors <= 4:
                    wbits = 2
                elif n_colors <= 16:
                    wbits = 1
                else:
                    wbits = 0
                transforms.append((3, wbits, pal, ew))
                if wbits:
                    ew = (ew + (1 << wbits) - 1) >> wbits

    cache_bits = br.bits(4) if br.bit() else 0
    cache = [(0, 0, 0, 0)] * (1 << cache_bits) if cache_bits else None

    meta = None
    meta_w = hbits = 0
    n_groups = 1
    if is_level0 and br.bit():
        hbits = br.bits(3) + 2
        meta_w = (ew + (1 << hbits) - 1) >> hbits
        meta_h = (h + (1 << hbits) - 1) >> hbits
        meta_px, _ = _decode_entropy_image(br, meta_w, meta_h, False)
        meta = [(p[1] << 8) | p[2] for p in meta_px]  # (R<<8)|G
        n_groups = max(meta) + 1

    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = [
        (
            _read_prefix_code(br, 256 + 24 + cache_size),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 40),
        )
        for _ in range(n_groups)
    ]

    n_px = ew * h
    out = []

    def emit(px):
        out.append(px)
        if cache is not None:
            key = (
                0x1E35A7BD
                * ((px[0] << 24) | (px[1] << 16) | (px[2] << 8) | px[3])
                & 0xFFFFFFFF
            ) >> (32 - cache_bits)
            cache[key] = px

    while len(out) < n_px:
        if meta is not None:
            x, y = len(out) % ew, len(out) // ew
            grp = groups[meta[(y >> hbits) * meta_w + (x >> hbits)]]
        else:
            grp = groups[0]
        gcode, rcode, bcode, acode, dcode = grp
        s = gcode.read(br)
        if s < 256:
            g = s
            r = rcode.read(br)
            b = bcode.read(br)
            a = acode.read(br)
            emit((a, r, g, b))
        elif s < 280:
            length = _prefix_lz77_val(br, s - 256)
            dist_code = _prefix_lz77_val(br, dcode.read(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * ew + dx
                if dist < 1:
                    dist = 1
            for _ in range(length):
                emit(out[len(out) - dist])
        else:
            emit(cache[s - 280])
    return out, transforms


def _clamp(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def _avg2(a, b):
    return tuple((a[i] + b[i]) >> 1 for i in range(4))


def _predict(mode, L, T, TL, TR):
    if mode == 0:
        return (0xFF, 0, 0, 0)
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
        p = [L[i] + T[i] - TL[i] for i in range(4)]
        pl = sum(abs(p[i] - L[i]) for i in range(4))
        pt = sum(abs(p[i] - T[i]) for i in range(4))
        return L if pl < pt else T
    if mode == 12:  # ClampAddSubtractFull
        return tuple(_clamp(L[i] + T[i] - TL[i]) for i in range(4))
    if mode == 13:  # ClampAddSubtractHalf
        a = _avg2(L, T)
        return tuple(_clamp(a[i] + ((a[i] - TL[i]) >> 1)) for i in range(4))
    raise ValueError(f"naive vp8l: predictor mode {mode}")


def _i8(v):
    return v - 256 if v >= 128 else v


def _apply_inverse(px, transforms, h):
    for ttype, arg, sub, tw in reversed(transforms):
        if ttype == 3:  # color indexing
            wbits = arg
            if wbits:
                packed_w = (tw + (1 << wbits) - 1) >> wbits
                per = 1 << wbits
                bits_per = 8 >> wbits
                mask = (1 << bits_per) - 1
                unp = []
                for y in range(h):
                    for x in range(tw):
                        g = px[y * packed_w + (x >> wbits)][2]
                        unp.append((g >> ((x % per) * bits_per)) & mask)
                idx = unp
            else:
                idx = [p[2] for p in px]
            px = [sub[i] for i in idx]
        elif ttype == 2:  # add green
            px = [
                (a, (r + g) & 0xFF, g, (b + g) & 0xFF) for a, r, g, b in px
            ]
        elif ttype == 1:  # color transform inverse
            size_bits = arg
            bw = (tw + (1 << size_bits) - 1) >> size_bits
            out = []
            for pos, (a, r, g, b) in enumerate(px):
                x, y = pos % tw, pos // tw
                cte = sub[(y >> size_bits) * bw + (x >> size_bits)]
                # ColorTransformElement packing: g2r in BLUE channel,
                # g2b in GREEN, r2b in RED
                g2r, g2b, r2b = _i8(cte[3]), _i8(cte[2]), _i8(cte[1])
                r = (r + ((g2r * _i8(g)) >> 5)) & 0xFF
                b = (b + ((g2b * _i8(g)) >> 5) + ((r2b * _i8(r)) >> 5)) & 0xFF
                out.append((a, r, g, b))
            px = out
        elif ttype == 0:  # predictor inverse
            size_bits = arg
            bw = (tw + (1 << size_bits) - 1) >> size_bits
            out = []
            for pos, res in enumerate(px):
                x, y = pos % tw, pos // tw
                if pos == 0:
                    pred = (0xFF, 0, 0, 0)
                elif y == 0:
                    pred = out[pos - 1]
                elif x == 0:
                    pred = out[pos - tw]
                else:
                    mode = sub[(y >> size_bits) * bw + (x >> size_bits)][2]
                    L = out[pos - 1]
                    T = out[pos - tw]
                    TL = out[pos - tw - 1]
                    TR = out[pos - tw + 1]  # x==tw-1 wraps to row start
                    pred = _predict(mode, L, T, TL, TR)
                out.append(tuple((res[i] + pred[i]) & 0xFF for i in range(4)))
            px = out
    return px


def decode_webp_naive(data: bytes):
    """RIFF/WEBP/VP8L container -> list of rows of (R, G, B, A)
    tuples. Raises on malformed input (it is a reference, not a
    production envelope)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("naive vp8l: not a WEBP RIFF")
    pos = 12
    while pos < len(data):
        tag = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if tag == b"VP8L":
            payload = data[pos + 8 : pos + 8 + size]
            break
        pos += 8 + size + (size & 1)
    else:
        raise ValueError("naive vp8l: no VP8L chunk")
    if payload[0] != 0x2F:
        raise ValueError("naive vp8l: bad signature")
    br = _Bits(payload[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("naive vp8l: bad version")
    px, transforms = _decode_entropy_image(br, w, h, True)
    px = _apply_inverse(px, transforms, h)
    # ARGB tuples -> rows of RGBA
    return [
        [(p[1], p[2], p[3], p[0]) for p in px[y * w : (y + 1) * w]]
        for y in range(h)
    ]
