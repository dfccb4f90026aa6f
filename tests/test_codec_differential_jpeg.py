"""Differential conformance: production JPEG decoder vs the
spec-literal naive reference (tests/naive_jpeg_ref.py — zero shared
code/tables; VERDICT r9 #4).

Three layers:

1. Randomized fixtures through the production ENCODER, decoded by both
   decoders. The two IDCTs are independent float64 evaluations of the
   same T.81 math, so a pixel whose exact value sits within float
   error of a .5 rounding boundary may legally round apart — the gate
   is max |diff| <= 1 with <=0.5% of pixels differing. Any structural
   bug (Huffman, zigzag, dequant, predictor reset, upsample, color
   matrix) moves pixels by whole quantization steps and fails this by
   miles.
2. Progressive transitivity: a progressive encode of the same image
   carries the SAME quantized coefficients as the baseline encode, so
   production's progressive decode must match the naive BASELINE
   decode within the same float envelope — an independent check on
   the progressive path the naive decoder doesn't implement.
3. Hand-assembled byte streams with pixels worked out from the spec
   arithmetic (exact integers away from rounding boundaries): both
   decoders must produce EXACTLY the worked-out values.
"""

import math
import struct

import numpy as np
import pytest

from hbasewd_spark.operators.jpegcodec import (
    decode_baseline_jpeg,
    encode_baseline_jpeg,
    encode_progressive_jpeg,
)
from naive_jpeg_ref import ZIGZAG_T81, decode_jpeg_naive


def _diff_gate(a, b, what):
    assert a is not None and b is not None, what
    assert a.shape == b.shape, f"{what}: {a.shape} vs {b.shape}"
    d = np.abs(a.astype(np.int64) - b.astype(np.int64))
    frac = float((d > 0).mean())
    assert d.max() <= 1, f"{what}: max pixel diff {d.max()} (structural bug)"
    assert frac <= 0.005, f"{what}: {frac:.2%} pixels differ (rounding should be rare)"


def _images(seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:24, 0:40]
    grad = np.stack(
        [xx * 6 % 256, yy * 9 % 256, (xx + yy) * 4 % 256], axis=-1
    ).astype(np.uint8)
    noise = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    blocks = np.kron(
        rng.integers(0, 256, (3, 5, 3)), np.ones((8, 8, 1))
    ).astype(np.uint8)
    gray = (xx * 7 + yy * 3).astype(np.uint8)
    return {"grad": grad, "noise": noise, "blocks": blocks, "gray": gray}


@pytest.mark.parametrize("name", ["grad", "noise", "blocks", "gray"])
@pytest.mark.parametrize("subsample", [False, True])
def test_baseline_differential(name, subsample):
    img = _images(7)[name]
    if img.ndim == 2 and subsample:
        pytest.skip("grayscale has no chroma to subsample")
    enc = encode_baseline_jpeg(img, subsample=subsample)
    _diff_gate(
        decode_baseline_jpeg(enc),
        decode_jpeg_naive(enc),
        f"{name} subsample={subsample}",
    )


def test_restart_marker_differential():
    img = _images(11)["grad"]
    enc = encode_baseline_jpeg(img, subsample=True, restart_interval=2)
    _diff_gate(
        decode_baseline_jpeg(enc), decode_jpeg_naive(enc), "restart"
    )


def test_progressive_transitivity():
    """naive(baseline(img)) ~= production(progressive(img)): both
    streams carry identical quantized coefficients, so this checks the
    production progressive scan logic against the independent
    reference without the reference implementing progressive."""
    img = _images(13)["grad"]
    base = encode_baseline_jpeg(img)
    prog = encode_progressive_jpeg(img)
    _diff_gate(
        decode_baseline_jpeg(prog), decode_jpeg_naive(base), "progressive"
    )


# ---------------------------------------------------------------- hand
def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


# Minimal 1-bit DC Huffman table: categories 0 and 7 at lengths 1,2.
_DC_BITS = [0] * 16
_DC_BITS[0] = 1  # one 1-bit code
_DC_BITS[1] = 1  # one 2-bit code
_DC_VALS = [0, 7]  # cat 0 -> code "0", cat 7 -> code "10"
# AC table: single EOB symbol (1-bit code "0")
_AC_BITS = [1] + [0] * 15
_AC_VALS = [0x00]


def _hand_jpeg_gray_8x8(scan_bits):
    """One 8x8 grayscale component, ALL-ONES quant table, the tiny
    Huffman tables above, and caller-supplied scan bits (string of
    '0'/'1', padded with 1s to a byte per B.1.1.5)."""
    out = bytearray(b"\xff\xd8")
    qtab = bytearray([0])  # Pq=0, Tq=0
    qtab += bytes([1] * 64)  # all-ones table, zigzag order irrelevant
    out += _seg(0xDB, bytes(qtab))
    out += _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    pad = (-len(scan_bits)) % 8
    bits = scan_bits + "1" * pad
    out += bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    out += b"\xff\xd9"
    return bytes(out)


def test_hand_stream_dc_only_flat_block():
    """DC diff = +80 (category 7, magnitude bits 1010000), no AC.
    Worked out: F(0,0)=80, q=1 -> every pixel = 80/8 + 128 = 138
    exactly (the DC basis is constant 1/8 after the two C(0)=1/sqrt2
    factors and the 1/4). Integer-exact: both decoders must emit 138
    at all 64 pixels."""
    scan = "10" + "1010000" + "0"  # DC cat-7 code, +80 magnitude, AC EOB
    jpg = _hand_jpeg_gray_8x8(scan)
    expect = np.full((8, 8), 138, dtype=np.uint8)
    assert (decode_jpeg_naive(jpg) == expect).all()
    assert (decode_baseline_jpeg(jpg) == expect).all()


def test_hand_stream_negative_dc_extend():
    """DC diff = -80: category 7 with magnitude bits 0101111 (the
    one's-complement EXTEND rule F.2.2.1 — the classic sign bug).
    Every pixel = round(-80/8 + 128) = 118."""
    scan = "10" + "0101111" + "0"
    jpg = _hand_jpeg_gray_8x8(scan)
    expect = np.full((8, 8), 118, dtype=np.uint8)
    assert (decode_jpeg_naive(jpg) == expect).all()
    assert (decode_baseline_jpeg(jpg) == expect).all()


def test_hand_stream_two_blocks_dc_prediction():
    """16px-wide frame = two MCUs: diffs +80 then -80, so block 2's
    absolute DC is 0 -> pixels 138 then 128. Locks the DC PREDICTOR
    (not just absolute decode): a decoder that forgets the running
    predictor emits 118, not 128, in block 2."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 16) + bytes([1, 1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    scan = "10" + "1010000" + "0" + "10" + "0101111" + "0"
    pad = (-len(scan)) % 8
    bits = scan + "1" * pad
    out += bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    out += b"\xff\xd9"
    jpg = bytes(out)
    expect = np.concatenate(
        [np.full((8, 8), 138, np.uint8), np.full((8, 8), 128, np.uint8)], axis=1
    )
    assert (decode_jpeg_naive(jpg) == expect).all()
    assert (decode_baseline_jpeg(jpg) == expect).all()


def test_zigzag_literal_matches_derived():
    """The hand-transcribed T.81 Figure 5 table vs production's
    algorithmically derived one — a direct cross-check of the
    derivation itself."""
    from hbasewd_spark.operators.jpegcodec import ZIGZAG

    assert ZIGZAG.tolist() == ZIGZAG_T81


def test_direct_idct_matches_matrix_idct_on_random_blocks():
    """The two IDCT formulations (direct form vs orthonormal matrix
    sandwich) must agree to float tolerance on arbitrary coefficient
    blocks — isolates the transform from the entropy layers."""
    from hbasewd_spark.operators.jpegcodec import DCT_A
    from naive_jpeg_ref import idct_direct

    rng = np.random.default_rng(3)
    for _ in range(20):
        F = rng.integers(-1024, 1024, (8, 8)).astype(np.float64)
        direct = idct_direct(F)
        matrix = DCT_A.T @ F @ DCT_A + 128.0
        assert np.abs(direct - matrix).max() < 1e-9
