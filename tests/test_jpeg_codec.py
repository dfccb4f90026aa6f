"""JPEG codec (jpegcodec.py), baseline + progressive: roundtrip
proofs, envelope rejections, and the _decode_batch real-pixel branch.

No image library exists in this container, so correctness is
established the same way the PNG codec's was: a matching encoder,
property-style roundtrips (flat images reconstruct exactly under the
Annex K tables; smooth gradients reconstruct within quantization
error; restart-marker streams decode bit-identically to their
non-restart twins), plus structural cross-checks against the
independent header parser."""

import numpy as np
import pandas as pd
import pytest

from hbasewd_spark.operators.jpegcodec import (
    DCT_A,
    UNZIGZAG,
    ZIGZAG,
    decode_baseline_jpeg,
    encode_baseline_jpeg,
)
from hbasewd_spark.operators.multimodal import _decode_batch, parse_jpeg_header


def gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 / max(w - 1, 1),
            yy * 255 / max(h - 1, 1),
            (xx + yy) * 255 / max(w + h - 2, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


def rmse(a, b):
    return float(np.sqrt(((a.astype(float) - b.astype(float)) ** 2).mean()))


def test_dct_matrix_is_orthonormal_and_zigzag_is_a_permutation():
    assert np.allclose(DCT_A @ DCT_A.T, np.eye(8), atol=1e-12)
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert (ZIGZAG[UNZIGZAG] == np.arange(64)).all()
    # spec anchors: zigzag starts DC, (0,1), (1,0), (2,0), (1,1), (0,2)
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_flat_images_roundtrip_exactly():
    """A constant block has one nonzero (DC) coefficient; quantization
    is exact for it, so the roundtrip must be bit-perfect — a strong
    end-to-end check of DCT scaling, quant, Huffman, and the
    container."""
    for val in (0, 64, 128, 200, 255):
        img = np.full((16, 24, 3), val, np.uint8)
        out = decode_baseline_jpeg(encode_baseline_jpeg(img))
        assert out is not None and out.shape == img.shape
        assert int(np.abs(out.astype(int) - int(val)).max()) <= 1  # rgb<->ycbcr rounding
    gray = np.full((8, 8), 77, np.uint8)
    outg = decode_baseline_jpeg(encode_baseline_jpeg(gray))
    # 77 lands the DC coeff on an exact quantizer half-step (-25.5):
    # either rounding is spec-valid, so allow the one-step error
    assert outg.shape == (8, 8) and np.abs(outg.astype(int) - 77).max() <= 1


@pytest.mark.parametrize("h,w", [(8, 8), (24, 33), (35, 50), (7, 9)])
def test_gradient_roundtrip_within_quantization_error(h, w):
    img = gradient(h, w)
    b = encode_baseline_jpeg(img)
    hdr = parse_jpeg_header(b)  # independent parser agrees on geometry
    assert (hdr["width"], hdr["height"], hdr["channels"]) == (w, h, 3)
    out = decode_baseline_jpeg(b)
    assert out.shape == (h, w, 3)
    assert rmse(out, img) < 6.0  # Annex-K Q50 on smooth content


def test_grayscale_and_noise_roundtrip():
    yy = np.mgrid[0:20, 0:31][0]
    gray = (yy * 255 / 19).astype(np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(gray))
    assert out.shape == (20, 31) and rmse(out, gray) < 4.0
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8)
    outn = decode_baseline_jpeg(encode_baseline_jpeg(noise))
    # noise is the quantizer's worst case: bounded, not small
    assert outn.shape == noise.shape and rmse(outn, noise) < 80.0


def test_420_subsampling_decodes_with_bounded_chroma_loss():
    img = gradient(35, 50)
    b = encode_baseline_jpeg(img, subsample=True)
    out = decode_baseline_jpeg(b)
    assert out.shape == img.shape
    assert rmse(out, img) < 8.0
    # luma survives subsampling almost untouched
    luma = lambda x: 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    assert rmse(luma(out), luma(img)) < 4.0


def test_restart_markers_decode_identically():
    img = gradient(35, 50)
    base = decode_baseline_jpeg(encode_baseline_jpeg(img))
    for interval in (1, 2, 5):
        b = encode_baseline_jpeg(img, restart_interval=interval)
        assert b"\xff\xdd" in b  # DRI present
        out = decode_baseline_jpeg(b)
        assert (out == base).all(), f"restart_interval={interval}"
    # 4:2:0 + restarts together
    b = encode_baseline_jpeg(img, subsample=True, restart_interval=1)
    base420 = decode_baseline_jpeg(encode_baseline_jpeg(img, subsample=True))
    assert (decode_baseline_jpeg(b) == base420).all()


def test_envelope_rejections_return_none():
    img = gradient(16, 16)
    good = encode_baseline_jpeg(img)
    assert decode_baseline_jpeg(b"") is None
    assert decode_baseline_jpeg(b"junk bytes") is None
    assert decode_baseline_jpeg(good[:60]) is None  # truncated pre-SOS
    assert decode_baseline_jpeg(good[:-20]) is None  # truncated entropy
    prog = bytearray(good)
    # flipping SOF0->SOF2 makes the baseline scan MALFORMED progressive
    # (a DC scan must have Se == 0, this one declares Se = 63)
    prog[prog.find(b"\xff\xc0") + 1] = 0xC2
    assert decode_baseline_jpeg(bytes(prog)) is None
    twelve = bytearray(good)
    i = twelve.find(b"\xff\xc0")
    twelve[i + 4] = 12  # 12-bit precision: unsupported
    assert decode_baseline_jpeg(bytes(twelve)) is None


def test_bomb_guard_rejects_huge_declared_raster():
    """Geometry ceiling applies at SOF parse, before any coefficient
    allocation — a tiny stream claiming 65500x65500 must bail fast."""
    import struct as _struct
    import time

    good = bytearray(encode_baseline_jpeg(gradient(8, 8)))
    i = good.find(b"\xff\xc0")
    good[i + 5 : i + 9] = _struct.pack(">HH", 65500, 65500)
    t0 = time.time()
    assert decode_baseline_jpeg(bytes(good)) is None
    assert time.time() - t0 < 0.5


def test_decode_batch_uses_real_jpeg_pixels():
    """The multimodal decode operator now runs the REAL baseline
    decoder: byte_sum/mean_luma come from decoded pixels (matching an
    independent in-test decode), not from payload bytes."""
    img = gradient(24, 33)
    b = encode_baseline_jpeg(img)
    ref = decode_baseline_jpeg(b)
    pdf = pd.DataFrame(
        {
            "doc_id": [1],
            "payload": [b],
            "meta": [{"format": "jpeg", "n_bytes": len(b), "source": "t"}],
        }
    )
    out = _decode_batch(pdf).set_index("doc_id")
    assert (out.loc[1, "width"], out.loc[1, "height"]) == (33, 24)
    assert out.loc[1, "byte_sum"] == int(ref.sum())
    assert out.loc[1, "mean_luma"] == pytest.approx(ref.sum() / ref.size)
    assert out.loc[1, "byte_sum"] != sum(b)  # pixels, not payload bytes


# ------------------------------------------------- progressive (SOF2)
def test_progressive_decodes_identical_to_baseline():
    """Progressive transmission reorders the SAME quantized
    coefficients — decode must be bit-identical to the baseline
    encoding of the same image, for both scan-script shapes."""
    from hbasewd_spark.operators.jpegcodec import encode_progressive_jpeg

    img = gradient(24, 33)
    base = decode_baseline_jpeg(encode_baseline_jpeg(img))
    for successive in (False, True):
        b = encode_progressive_jpeg(img, successive=successive)
        hdr = parse_jpeg_header(b)
        assert hdr["progressive"] is True
        out = decode_baseline_jpeg(b)
        assert out is not None and (out == base).all(), f"successive={successive}"


def test_progressive_successive_approximation_paths():
    """Noise maximizes refinement traffic (every AC magnitude parity
    is a correction bit); 4:2:0 adds non-interleaved chroma grids;
    grayscale covers the single-component script."""
    from hbasewd_spark.operators.jpegcodec import encode_progressive_jpeg

    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8)
    assert (
        decode_baseline_jpeg(encode_progressive_jpeg(noise))
        == decode_baseline_jpeg(encode_baseline_jpeg(noise))
    ).all()
    img = gradient(35, 50)
    assert (
        decode_baseline_jpeg(encode_progressive_jpeg(img, subsample=True))
        == decode_baseline_jpeg(encode_baseline_jpeg(img, subsample=True))
    ).all()
    gray = (np.mgrid[0:20, 0:31][0] * 255 // 19).astype(np.uint8)
    assert (
        decode_baseline_jpeg(encode_progressive_jpeg(gray))
        == decode_baseline_jpeg(encode_baseline_jpeg(gray))
    ).all()


def test_progressive_sparse_and_flat_eob_runs():
    """Images whose AC bands are almost all zero drive long EOB runs
    (the (1<<r)+extra accumulation) through both encoder and decoder."""
    from hbasewd_spark.operators.jpegcodec import encode_progressive_jpeg

    flat = np.full((40, 48, 3), 128, np.uint8)
    assert (
        decode_baseline_jpeg(encode_progressive_jpeg(flat))
        == decode_baseline_jpeg(encode_baseline_jpeg(flat))
    ).all()
    sparse = np.full((40, 48), 100, np.uint8)
    sparse[8, 8] = 255  # one impulse -> one busy block among many EOBs
    assert (
        decode_baseline_jpeg(encode_progressive_jpeg(sparse))
        == decode_baseline_jpeg(encode_baseline_jpeg(sparse))
    ).all()


def test_progressive_decode_batch_branch():
    """decode_media's jpeg branch decodes progressive payloads for
    real now (the r6 header-only fallback is gone for SOF2)."""
    from hbasewd_spark.operators.jpegcodec import decode_jpeg, encode_progressive_jpeg

    img = gradient(16, 21)
    b = encode_progressive_jpeg(img)
    ref = decode_jpeg(b)
    pdf = pd.DataFrame(
        {
            "doc_id": [1],
            "payload": [b],
            "meta": [{"format": "jpeg", "n_bytes": len(b), "source": "t"}],
        }
    )
    out = _decode_batch(pdf).set_index("doc_id")
    assert (out.loc[1, "width"], out.loc[1, "height"]) == (21, 16)
    assert out.loc[1, "byte_sum"] == int(ref.sum())
