"""Real PNG decode branch: stdlib struct+zlib parse and five-filter
scanline reconstruction inside the mapInPandas batch, exactly like the
WAV and BMP branches (VERDICT r5 next-round #5)."""

from __future__ import annotations

import struct
import zlib

import pandas as pd
import pytest

from hbasewd_spark.operators.multimodal import (
    _decode_batch,
    _png_defilter,
    parse_png,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def make_png(
    pixels: list[list[list[int]]],
    color_type: int = 2,
    filters: list[int] | None = None,
    bit_depth: int = 8,
    interlace: int = 0,
) -> bytes:
    """Encode a pixel array (rows x cols x channels) as a valid PNG,
    applying the REQUESTED filter type per scanline so every
    reconstruction branch can be exercised against known pixels."""
    h, w = len(pixels), len(pixels[0])
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    bpp = ch
    filters = filters or [0] * h
    raw = bytearray()
    prev = bytes(w * ch)
    for y, ft in zip(range(h), filters):
        row = bytes(v for px in pixels[y] for v in px)
        enc = bytearray(row)
        if ft == 1:  # Sub
            for x in range(len(row) - 1, bpp - 1, -1):
                enc[x] = (row[x] - row[x - bpp]) & 0xFF
        elif ft == 2:  # Up
            for x in range(len(row)):
                enc[x] = (row[x] - prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(len(row)):
                left = row[x - bpp] if x >= bpp else 0
                enc[x] = (row[x] - ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(len(row)):
                a = row[x - bpp] if x >= bpp else 0
                up = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pr = a if pa <= pb and pa <= pc else up if pb <= pc else c
                enc[x] = (row[x] - pr) & 0xFF
        raw += bytes([ft]) + bytes(enc)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


PIXELS = [
    [[10, 20, 30], [40, 50, 60], [70, 80, 90]],
    [[15, 25, 35], [45, 55, 65], [75, 85, 95]],
]
FLAT = bytes(v for row in PIXELS for px in row for v in px)


def test_parse_png_geometry():
    info = parse_png(make_png(PIXELS))
    assert (info["width"], info["height"]) == (3, 2)
    assert (info["color_type"], info["channels"], info["bit_depth"]) == (2, 3, 8)
    assert info["row_bytes"] == 9


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_defilter_reconstructs_exact_pixels_per_filter(ft):
    b = make_png(PIXELS, filters=[ft, ft])
    assert _png_defilter(parse_png(b)) == FLAT


def test_defilter_mixed_filters_and_gray_rgba():
    b = make_png(PIXELS, filters=[4, 2])
    assert _png_defilter(parse_png(b)) == FLAT
    gray = [[[7], [250]], [[0], [128]]]
    assert _png_defilter(parse_png(make_png(gray, color_type=0))) == bytes(
        [7, 250, 0, 128]
    )
    rgba = [[[1, 2, 3, 4], [5, 6, 7, 8]]]
    assert _png_defilter(parse_png(make_png(rgba, color_type=6))) == bytes(
        range(1, 9)
    )


def test_multi_idat_chunks_concatenate():
    b = make_png(PIXELS)
    # split the single IDAT into two: find it and re-chunk
    sig_ihdr_len = 8 + 12 + 13
    (size,) = struct.unpack_from(">I", b, sig_ihdr_len)
    body = b[sig_ihdr_len + 8 : sig_ihdr_len + 8 + size]
    cut = len(body) // 2
    rebuilt = (
        b[:sig_ihdr_len]
        + _chunk(b"IDAT", body[:cut])
        + _chunk(b"IDAT", body[cut:])
        + _chunk(b"IEND", b"")
    )
    assert _png_defilter(parse_png(rebuilt)) == FLAT


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b"\x00" + b[1:],                        # bad signature
        lambda b: b[:-12],                                # IEND missing
        lambda b: b[:40],                                 # truncated chunk
        lambda b: b.replace(b"\x08\x02", b"\x08\x03", 1), # palette color type
        lambda b: b.replace(b"\x08\x02\x00\x00\x00", b"\x08\x02\x00\x00\x01", 1),
    ],
)
def test_malformed_or_unsupported_png_returns_none(mutate):
    assert parse_png(mutate(make_png(PIXELS))) is None


def test_corrupt_idat_returns_none():
    b = make_png(PIXELS)
    sig_ihdr_len = 8 + 12 + 13
    (size,) = struct.unpack_from(">I", b, sig_ihdr_len)
    bad = bytearray(b)
    bad[sig_ihdr_len + 8 + 4] ^= 0xFF  # flip a deflate byte
    assert parse_png(bytes(bad)) is None


def test_decode_batch_real_png_branch_vs_fake():
    png_bytes = make_png(PIXELS, filters=[1, 4])
    fake_bytes = b"not a png at all, but labeled png"
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "payload": [png_bytes, fake_bytes],
            "meta": [
                {"format": "png", "n_bytes": len(png_bytes), "source": "t"},
                {"format": "png", "n_bytes": len(fake_bytes), "source": "t"},
            ],
        }
    )
    out = _decode_batch(pdf).set_index("doc_id")
    # real branch: true geometry + defiltered pixel stats
    assert (out.loc[1, "width"], out.loc[1, "height"]) == (3, 2)
    assert out.loc[1, "byte_sum"] == sum(FLAT)
    assert out.loc[1, "mean_luma"] == pytest.approx(sum(FLAT) / len(FLAT))
    # malformed bytes under the png label fall back to the
    # deterministic fake (length-derived geometry), never crash
    assert out.loc[2, "width"] == 16 + len(fake_bytes) % 240


def test_bomb_guard_rejects_huge_declared_raster_without_inflating():
    """ADVICE r6: a small PNG declaring an enormous w*h must be
    rejected from the IHDR math alone — before the IDAT stream is
    inflated. Build one whose DECLARED raster is ~48 GiB but whose
    compressed payload is a few KiB; parse must return None fast and
    without a giant allocation."""
    import resource
    import time

    w = h = 1 << 17  # 131072 x 131072 RGB -> ~48 GiB raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # a real (but tiny) zlib stream — content is irrelevant, the
    # guard must trip before it is inflated
    idat = zlib.compress(b"\x00" * 4096)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )
    t0 = time.time()
    assert parse_png(bomb) is None
    assert time.time() - t0 < 1.0


def test_bomb_guard_caps_inflation_of_lying_stream():
    """A zlib stream that inflates to far MORE than the declared
    raster must stop at expected+1 bytes, not materialize the bomb:
    declared 3x2 RGB (27 raw bytes) but the stream holds 64 MiB of
    zeros. Reject, and peak allocation stays tiny."""
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"\x00" * (64 << 20))  # ~64 KiB compressed
    lying = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )
    assert parse_png(lying) is None


def test_truncated_stream_still_rejected_under_guard():
    """The decompressobj rewrite keeps the old strictness: a stream
    that inflates to LESS than the declared raster is rejected (eof
    not reached or short output)."""
    good = make_png(PIXELS)
    info = parse_png(good)
    assert info is not None
    # corrupt: declared raster one row taller than the stream provides
    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0)
    raw_2rows = zlib.compress(b"\x00" * (2 * (1 + 9)))
    short = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", raw_2rows)
        + _chunk(b"IEND", b"")
    )
    assert parse_png(short) is None
