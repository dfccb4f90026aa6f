"""Header-only JPEG/WebP metadata parsing (VERDICT r6 #6): real
geometry from crafted fixtures with zero codec libraries; pixel decode
stays behind the loud seam."""

import struct

import pandas as pd
import pytest

from hbasewd_spark.operators.multimodal import (
    _decode_batch,
    parse_jpeg_header,
    parse_webp_header,
)


def make_jpeg(w=640, h=480, ncomp=3, marker=0xC0, precision=8) -> bytes:
    """Minimal valid JPEG prefix: SOI, APP0(JFIF), DQT stub, SOFn,
    then a truncated tail (header parsing never needs entropy data)."""
    soi = b"\xff\xd8"
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    app0 = b"\xff\xe0" + struct.pack(">H", 2 + len(jfif)) + jfif
    dqt_body = b"\x00" + bytes(64)
    dqt = b"\xff\xdb" + struct.pack(">H", 2 + len(dqt_body)) + dqt_body
    sof_body = struct.pack(">BHHB", precision, h, w, ncomp) + bytes(3 * ncomp)
    sof = bytes([0xFF, marker]) + struct.pack(">H", 2 + len(sof_body)) + sof_body
    return soi + app0 + dqt + sof + b"\xff\xda\x00\x04\x00\x00"


def make_webp_vp8(w=320, h=240) -> bytes:
    payload = bytes(3) + b"\x9d\x01\x2a" + struct.pack("<HH", w, h) + bytes(8)
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def make_webp_vp8l(w=100, h=60, alpha=0) -> bytes:
    bits = (w - 1) | ((h - 1) << 14) | (alpha << 28)
    payload = b"\x2f" + struct.pack("<I", bits) + bytes(4)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def make_webp_vp8x(w=1920, h=1080, alpha=1) -> bytes:
    flags = 0x10 if alpha else 0
    payload = (
        bytes([flags]) + bytes(3)
        + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    )
    chunk = b"VP8X" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_jpeg_sof_walk_baseline_and_progressive():
    assert parse_jpeg_header(make_jpeg(640, 480)) == {
        "width": 640, "height": 480, "bit_depth": 8, "channels": 3,
        "progressive": False,
    }
    prog = parse_jpeg_header(make_jpeg(31, 17, ncomp=1, marker=0xC2))
    assert (prog["width"], prog["height"], prog["channels"]) == (31, 17, 1)
    assert prog["progressive"] is True


def test_jpeg_rejects_malformed():
    assert parse_jpeg_header(b"") is None
    assert parse_jpeg_header(b"\xff\xd8\xff") is None
    assert parse_jpeg_header(b"not a jpeg at all............") is None
    # DHT (C4) must NOT be mistaken for a SOF
    dht = b"\xff\xd8\xff\xc4\x00\x0a" + bytes(8)
    assert parse_jpeg_header(dht) is None
    # SOS before SOF is malformed
    assert parse_jpeg_header(b"\xff\xd8\xff\xda\x00\x04\x00\x00") is None
    # truncated SOF segment (declared length past the buffer)
    trunc = b"\xff\xd8\xff\xc0\x00\x11\x08\x00\x10"
    assert parse_jpeg_header(trunc) is None


def test_webp_three_chunk_layouts():
    assert parse_webp_header(make_webp_vp8(320, 240)) == {
        "width": 320, "height": 240, "channels": 3, "lossless": False,
    }
    assert parse_webp_header(make_webp_vp8l(100, 60)) == {
        "width": 100, "height": 60, "channels": 3, "lossless": True,
    }
    assert parse_webp_header(make_webp_vp8l(1, 1, alpha=1))["channels"] == 4
    assert parse_webp_header(make_webp_vp8x(1920, 1080, alpha=1)) == {
        "width": 1920, "height": 1080, "channels": 4, "lossless": None,
    }


def test_webp_rejects_malformed():
    assert parse_webp_header(b"") is None
    assert parse_webp_header(b"RIFF\x00\x00\x00\x00WAVE" + bytes(8)) is None
    # VP8 chunk without the sync code
    bad = make_webp_vp8()
    bad = bad.replace(b"\x9d\x01\x2a", b"\x00\x00\x00")
    assert parse_webp_header(bad) is None
    # VP8L without the signature byte
    badl = bytearray(make_webp_vp8l())
    badl[20] = 0x00
    assert parse_webp_header(bytes(badl)) is None


def test_decode_batch_real_header_branch_vs_fake():
    """_decode_batch: well-formed jpeg/webp payloads emit REAL header
    geometry; malformed bytes under the same labels keep the
    deterministic fake (length-derived geometry) — never crash."""
    jpg, webp = make_jpeg(640, 480), make_webp_vp8l(100, 60)
    fake_jpg = b"jpeg-labeled garbage bytes.........."
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "payload": [jpg, webp, fake_jpg],
            "meta": [
                {"format": "jpeg", "n_bytes": len(jpg), "source": "t"},
                {"format": "webp", "n_bytes": len(webp), "source": "t"},
                {"format": "jpeg", "n_bytes": len(fake_jpg), "source": "t"},
            ],
        }
    )
    out = _decode_batch(pdf).set_index("doc_id")
    assert (out.loc[1, "width"], out.loc[1, "height"]) == (640, 480)
    assert (out.loc[2, "width"], out.loc[2, "height"]) == (100, 60)
    assert out.loc[1, "byte_sum"] == sum(jpg)
    assert out.loc[3, "width"] == 16 + len(fake_jpg) % 240
    assert out.loc[3, "mean_luma"] == pytest.approx(
        sum(fake_jpg) / len(fake_jpg)
    )
