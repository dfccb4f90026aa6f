"""Real BMP decode branch: stdlib-struct parse of uncompressed BMPs
inside the mapInPandas batch, exactly like the WAV branch."""

from __future__ import annotations

import struct

import pandas as pd
import pytest

from hbasewd_spark.operators.multimodal import (
    _bmp_pixel_stats,
    _decode_batch,
    parse_bmp,
)


def make_bmp(width: int, height: int, bpp: int = 24, pixel_byte: int = 7,
             top_down: bool = False, pad_byte: int = 0xEE) -> bytes:
    """Minimal valid uncompressed BMP. Every pixel byte is
    ``pixel_byte``; every padding byte is ``pad_byte`` so tests can
    prove padding never leaks into stats."""
    row_bytes = width * bpp // 8
    stride = ((width * bpp + 31) // 32) * 4
    px = bytearray()
    for _ in range(height):
        px += bytes([pixel_byte]) * row_bytes + bytes([pad_byte]) * (stride - row_bytes)
    px_off = 14 + 40
    h = -height if top_down else height
    hdr = (
        b"BM"
        + struct.pack("<IHHI", px_off + len(px), 0, 0, px_off)
        + struct.pack("<IiiHHIIiiII", 40, width, h, 1, bpp, 0, len(px), 2835, 2835, 0, 0)
    )
    return bytes(hdr + px)


def test_parse_bmp_geometry_and_stats():
    b = make_bmp(3, 2, bpp=24, pixel_byte=10)
    info = parse_bmp(b)
    assert info == {
        "width": 3, "height": 2, "bpp": 24, "row_stride": 12,
        "px_off": 54, "top_down": False,
    }
    s, n = _bmp_pixel_stats(b, info)
    # 3 px * 3 bytes * 2 rows = 18 payload bytes of value 10; the 0xEE
    # padding (3 bytes per row) MUST NOT contribute
    assert (s, n) == (180, 18)


def test_parse_bmp_top_down_and_32bpp():
    assert parse_bmp(make_bmp(5, 4, top_down=True))["top_down"] is True
    info = parse_bmp(make_bmp(2, 2, bpp=32, pixel_byte=1))
    assert info["bpp"] == 32 and info["row_stride"] == 8
    s, n = _bmp_pixel_stats(make_bmp(2, 2, bpp=32, pixel_byte=1), info)
    assert (s, n) == (16, 16)  # no padding at 32bpp


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:40],                      # truncated header
        lambda b: b"XX" + b[2:],               # bad magic
        lambda b: b[:30] + struct.pack("<I", 1) + b[34:],  # RLE compression
        lambda b: b[:-5],                      # pixel array truncated
        lambda b: b"",
    ],
)
def test_parse_bmp_rejects_malformed(mutate):
    assert parse_bmp(mutate(make_bmp(4, 3))) is None


def test_decode_batch_routes_bmp_and_falls_back():
    good = make_bmp(6, 2, pixel_byte=5)
    out = _decode_batch(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "payload": [good, b"not a bitmap", good],
                "meta": [
                    {"format": "bmp"},
                    {"format": "bmp"},   # malformed -> deterministic fake
                    {"format": "png"},   # real BMP bytes but png label -> fake
                ],
            }
        )
    )
    r = out.iloc[0]
    assert (r.width, r.height) == (6, 2)
    assert r.byte_sum == 6 * 3 * 2 * 5 and r.mean_luma == 5.0
    # fallback rows take the stand-in geometry, never crash
    assert out.iloc[1].width == 16 + len(b"not a bitmap") % 240
    # a png-labeled payload is NOT parsed as bmp (format gates the codec)
    assert out.iloc[2].byte_sum == sum(good)


def test_decode_media_end_to_end_with_bmp(spark):
    from hbasewd_spark.operators.multimodal import MEDIA_SCHEMA, decode_media

    rows = [
        (1, make_bmp(8, 3, pixel_byte=2), ("bmp", 0, "s")),
        (2, b"\x00\x01garbage", ("bmp", 0, "s")),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.doc_id: r for r in decode_media(df).collect()}
    assert (got[1].width, got[1].height) == (8, 3)
    assert got[1].byte_sum == 8 * 3 * 3 * 2
    assert got[2].width == 16 + len(b"\x00\x01garbage") % 240
