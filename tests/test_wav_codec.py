"""Round-5 lock for the real WAV codec (VERDICT r4 item 7): genuine
PCM WAV payloads are parsed with stdlib struct inside the existing
mapInPandas decode batch — no codec library, no new dependency — while
non-WAV bytes keep the deterministic image stand-in, so the driver's
ext_multimodal_stats oracle (text payloads, never valid RIFF) is
unchanged."""

import io
import struct
import wave

import pandas as pd
from pyspark.sql import functions as F

from hbasewd_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    parse_wav,
)


def make_wav(channels=2, rate=8000, bits=16, n_frames=100, tone=7):
    """A genuine PCM WAV via the stdlib wave module."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(bits // 8)
        w.setframerate(rate)
        frames = bytes(
            (i * tone) % 251 for i in range(n_frames * channels * (bits // 8))
        )
        w.writeframes(frames)
    return buf.getvalue(), frames


def test_parse_wav_reads_real_header_and_data():
    b, frames = make_wav(channels=2, rate=8000, bits=16, n_frames=100)
    info = parse_wav(b)
    assert info is not None
    assert info["channels"] == 2
    assert info["sample_rate"] == 8000
    assert info["bits_per_sample"] == 16
    assert info["block_align"] == 4
    assert info["n_frames"] == 100
    assert info["duration_s"] == 100 / 8000
    data = b[info["data_offset"] : info["data_offset"] + info["data_bytes"]]
    assert data == frames


def test_parse_wav_rejects_garbage_and_truncation():
    assert parse_wav(b"") is None
    assert parse_wav(b"not a wav at all") is None
    assert parse_wav(b"RIFF\x00\x00\x00\x00WAVE") is None  # no chunks
    b, _ = make_wav()
    assert parse_wav(b[:20]) is None  # truncated before fmt
    # non-PCM format code is refused
    mutated = bytearray(b)
    fmt_off = b.index(b"fmt ") + 8
    struct.pack_into("<H", mutated, fmt_off, 3)  # IEEE float
    assert parse_wav(bytes(mutated)) is None


def test_decode_media_real_wav_branch_end_to_end(spark):
    """Through the actual mapInPandas operator: WAV rows surface
    channels/bits as width/height and data-chunk byte stats; a text
    payload labeled 'wav' falls back to the image stand-in (the shape
    every driver-oracle row takes)."""
    wav_bytes, frames = make_wav(channels=1, rate=16000, bits=8, n_frames=500)
    text_bytes = b"definitely not riff"
    rows = [
        (1, wav_bytes, {"format": "wav", "n_bytes": len(wav_bytes), "source": "t"}),
        (2, text_bytes, {"format": "wav", "n_bytes": len(text_bytes), "source": "t"}),
        (3, text_bytes, {"format": "png", "n_bytes": len(text_bytes), "source": "t"}),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.doc_id: r for r in decode_media(df).collect()}

    real = out[1]
    assert (real.width, real.height) == (1, 8)  # channels, bits
    assert real.byte_sum == sum(frames)
    assert real.mean_luma == sum(frames) / len(frames)
    assert real.n_bytes == len(wav_bytes)

    fake = out[2]  # labeled wav but not RIFF -> image stand-in
    assert fake.byte_sum == sum(text_bytes)
    assert fake.width == 16 + len(text_bytes) % 240
    img = out[3]
    assert (img.width, img.height) == (fake.width, fake.height)


def test_multimodal_stats_query_unchanged_by_wav_branch(spark, sf_dir):
    """The registry query's payloads are UTF-8 text (never RIFF), so
    the real branch must not alter its results — the oracle contract."""
    import duckdb

    from hbasewd_spark.operators.multimodal import MEDIA_STATS_ORACLE, media_stats

    got = {
        r.format: (r.n, r.total_bytes, r.min_width, r.max_height)
        for r in media_stats(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.sql(MEDIA_STATS_ORACLE).fetchall()
    }
    assert got == want
