"""VP8L (WebP lossless) codec: exact roundtrips across every decoder
feature, spec-structure pins, envelope rejections, and the
_decode_batch real-pixel branch.

Correctness strategy mirrors the PNG/JPEG codecs': a matching
spec-compliant encoder + EXACT roundtrips (lossless format — any
single-bit defect in trees, LZ77, cache, or transforms breaks
equality), plus structural pins on the spec-fixed constants and
cross-checks against the independent header parser."""

import numpy as np
import pandas as pd
import pytest

from hbasewd_spark.operators.multimodal import _decode_batch, parse_webp_header
from hbasewd_spark.operators.vp8lcodec import (
    DIST_MAP,
    KORDER,
    _canonical,
    _prefix_code,
    _prefix_val,
    decode_webp,
    encode_vp8l,
)


def rgba(img):
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[2] == 3:
        a = np.full((*img.shape[:2], 1), 255, np.uint8)
        img = np.concatenate([img, a], axis=-1)
    return img


def gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
         (xx + yy) * 255 // max(w + h - 2, 1)],
        axis=-1,
    ).astype(np.uint8)


def roundtrip(img, **kw):
    out = decode_webp(encode_vp8l(img, **kw))
    assert out is not None
    assert (out == rgba(img)).all()
    return out


def test_spec_constant_pins():
    # code-length-code order and distance-map anchors (VP8L spec)
    assert KORDER == [17, 18, 0, 1, 2, 3, 4, 5, 16,
                      6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
    assert len(DIST_MAP) == 120
    assert DIST_MAP[0] == (0, 1) and DIST_MAP[1] == (1, 0)
    assert DIST_MAP[119] == (8, 7)
    assert len(set(DIST_MAP)) == 120
    # prefix coding is self-inverse over its whole domain
    class _FakeBR:
        def __init__(self, v):
            self.v = v
        def read_bits(self, n):
            return self.v & ((1 << n) - 1)
    for v in list(range(1, 200)) + [4096, 100_000]:
        code, ebits, extra = _prefix_code(v)
        assert _prefix_val(_FakeBR(extra), code) == v


def test_canonical_code_is_deflate_style():
    # lengths [2,1,3,3] -> sym1:0, sym0:10, sym2:110, sym3:111
    dmap, emap = _canonical([2, 1, 3, 3])
    assert emap[1] == (0b0, 1)
    assert emap[0] == (0b10, 2)
    assert emap[2] == (0b110, 3)
    assert emap[3] == (0b111, 3)
    assert dmap[(3, 0b111)] == 3


def test_literal_and_tree_roundtrips():
    roundtrip(gradient(13, 21), use_lz77=False)       # full trees
    roundtrip(np.full((4, 5, 3), 9, np.uint8), use_lz77=False)  # simple trees


def test_lz77_runs_plain_and_mapped_distance():
    flat = np.full((10, 16, 3), 77, np.uint8)
    b_plain = encode_vp8l(flat)
    b_map = encode_vp8l(flat, map_dist=True)
    assert (decode_webp(b_plain) == rgba(flat)).all()
    assert (decode_webp(b_map) == rgba(flat)).all()
    # on run-heavy VARIED content, references beat literals by a lot
    # (a constant image is the wrong probe: its literal trees are all
    # single-symbol, i.e. 0 bits per pixel)
    rng = np.random.default_rng(2)
    rows = rng.integers(0, 256, (12, 1, 3), dtype=np.uint8)
    runs_img = np.repeat(rows, 30, axis=1)  # 12 rows, each one color
    assert (decode_webp(encode_vp8l(runs_img)) == rgba(runs_img)).all()
    assert len(encode_vp8l(runs_img)) < len(encode_vp8l(runs_img, use_lz77=False)) / 3


def test_color_cache_hits_compress_and_roundtrip():
    rng = np.random.default_rng(5)
    tiles = np.array([[10, 200, 30], [250, 40, 90], [5, 5, 5], [77, 1, 199]],
                     np.uint8)
    img = tiles[rng.integers(0, 4, (16, 23))]
    # forbid runs so every repeat must come from the cache
    b_cache = encode_vp8l(img, use_lz77=False, cache_bits=4)
    b_plain = encode_vp8l(img, use_lz77=False)
    assert (decode_webp(b_cache) == rgba(img)).all()
    assert len(b_cache) < 0.7 * len(b_plain)  # hits actually happened


def test_alpha_channel_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (9, 14, 4), dtype=np.uint8)
    out = roundtrip(img, cache_bits=6)
    assert (out[..., 3] == img[..., 3]).all()


def test_subtract_green_transform():
    roundtrip(gradient(13, 21), subtract_green=True)


@pytest.mark.parametrize("mode", list(range(14)))
def test_all_predictor_modes(mode):
    rng = np.random.default_rng(mode)
    img = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    roundtrip(img, predictor_mode=mode, transform_bits=2)
    roundtrip(gradient(9, 17), predictor_mode=mode)


def test_color_transform():
    roundtrip(gradient(13, 21), color_transform=(16, 8, 4))
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (8, 9, 3), dtype=np.uint8)
    # negative multipliers exercise the signed 3.5 fixed-point path
    roundtrip(img, color_transform=(0xF0, 0x90, 0x7F), transform_bits=3)


def test_stacked_transforms():
    roundtrip(gradient(13, 21), predictor_mode=7, subtract_green=True)
    roundtrip(gradient(13, 21), predictor_mode=12, subtract_green=True,
              cache_bits=3)


@pytest.mark.parametrize("n_colors,wbits", [(2, 3), (4, 2), (13, 1), (40, 0)])
def test_palette_all_packing_widths(n_colors, wbits):
    rng = np.random.default_rng(n_colors)
    lut = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    img = lut[rng.integers(0, n_colors, (12, 17))]
    out = roundtrip(img, palette=True, use_lz77=False)
    assert out.shape == (12, 17, 4)


def test_header_parser_agrees_with_decoder():
    img = gradient(24, 33)
    b = encode_vp8l(img)
    hdr = parse_webp_header(b)
    assert (hdr["width"], hdr["height"], hdr["lossless"]) == (33, 24, True)
    out = decode_webp(b)
    assert out.shape == (24, 33, 4)


def test_envelope_rejections_return_none():
    assert decode_webp(b"") is None
    assert decode_webp(b"RIFF\x00\x00\x00\x00WEBPVP8 " + bytes(12)) is None
    good = bytearray(encode_vp8l(gradient(8, 8)))
    assert decode_webp(bytes(good)[:30]) is None  # truncated
    bad = bytearray(good)
    bad[20] = 0x00  # break the 0x2F signature
    assert decode_webp(bytes(bad)) is None
    # huge declared raster: rejected before allocation
    import struct, time
    wh = (4999 | (4999 << 14)) & 0xFFFFFFFF
    payload = b"\x2f" + struct.pack("<I", wh)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    riff = b"WEBP" + chunk + b"\x00"
    bomb = b"RIFF" + struct.pack("<I", len(riff)) + riff
    t0 = time.time()
    assert decode_webp(bomb) is None
    assert time.time() - t0 < 0.5


def test_decode_batch_uses_real_webp_pixels():
    img = gradient(16, 23)
    b = encode_vp8l(img, cache_bits=4)
    ref = rgba(img)
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "payload": [b, b"webp-labeled garbage........"],
            "meta": [
                {"format": "webp", "n_bytes": len(b), "source": "t"},
                {"format": "webp", "n_bytes": 28, "source": "t"},
            ],
        }
    )
    out = _decode_batch(pdf).set_index("doc_id")
    assert (out.loc[1, "width"], out.loc[1, "height"]) == (23, 16)
    assert out.loc[1, "byte_sum"] == int(ref.sum())
    assert out.loc[1, "mean_luma"] == pytest.approx(ref.sum() / ref.size)
    # malformed bytes fall back to the deterministic fake
    assert out.loc[2, "width"] == 16 + 28 % 240


def test_meta_huffman_two_groups():
    """A 2-group meta-Huffman image (group = x-block parity): the
    decoder must route every pixel through its block's own trees."""
    rng = np.random.default_rng(9)
    # left and right halves drawn from disjoint palettes so per-group
    # trees differ materially
    img = np.zeros((20, 32, 3), np.uint8)
    img[:, :16] = rng.integers(0, 64, (20, 16, 3))
    img[:, 16:] = rng.integers(192, 256, (20, 16, 3))
    b = encode_vp8l(img, meta_groups=2)
    out = decode_webp(b)
    assert out is not None and (out == rgba(img)).all()
    # also wide enough to span several 8px blocks per row
    img2 = rng.integers(0, 256, (9, 50, 3), dtype=np.uint8)
    assert (decode_webp(encode_vp8l(img2, meta_groups=2)) == rgba(img2)).all()
