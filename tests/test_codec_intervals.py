"""Codec round-trips (P8) and interval fan-out parity (O7) incl. the
unsorted-prefix regression the reference gets wrong (SURVEY.md O7)."""

import struct

import pytest
from pyspark.sql import functions as F, types as T

from hbasewd_spark.functions import codec
from hbasewd_spark.plans.distributor import (
    Hash31Distributor,
    IdentityDistributor,
    MultiBytePrefixDistributor,
)
from hbasewd_spark.plans.intervals import distributed_intervals


@pytest.mark.parametrize(
    "v", [0, 1, -1, 2**62, -(2**62), 2**63 - 1, -(2**63), 1_700_000_000_500]
)
def test_long_codec_roundtrip(spark, v):
    """encode_long_be == Bytes.toBytes(long); decode inverts, over the
    full signed-long domain."""
    df = spark.createDataFrame([(v,)], "v long")
    row = df.select(
        codec.encode_long_be("v").alias("enc"),
        codec.decode_long_be(codec.encode_long_be("v")).alias("dec"),
    ).collect()[0]
    assert bytes(row.enc) == struct.pack(">q", v)
    assert row.dec == v


def test_binary_order_matches_bytes_compareto(spark):
    """Spark BinaryType ordering must equal HBase Bytes.compareTo
    (unsigned lexicographic) — the invariant the ordered merge relies
    on (DistributedScanner.java:126-131)."""
    import random

    rng = random.Random(7)
    vals = [bytes(rng.randrange(256) for _ in range(rng.randrange(1, 6))) for _ in range(200)]
    df = spark.createDataFrame(
        [(v,) for v in vals], T.StructType([T.StructField("b", T.BinaryType(), False)])
    )
    got = [bytes(r.b) for r in df.orderBy("b").collect()]
    assert got == sorted(vals)  # python bytes sort == unsigned lex


def test_intervals_bounded():
    d = Hash31Distributor(3)
    ivs = distributed_intervals(d, b"\x10", b"\x20")
    assert ivs == [
        (b"\x00", b"\x00\x10", b"\x00\x20"),
        (b"\x01", b"\x01\x10", b"\x01\x20"),
        (b"\x02", b"\x02\x10", b"\x02\x20"),
    ]


def test_intervals_unbounded_tile():
    """Stop-less scan: bucket i's stop = bucket i+1's prefix; last is
    open (AbstractRowKeyDistributor.java:50-57)."""
    d = Hash31Distributor(3)
    ivs = distributed_intervals(d, b"\x10", None)
    assert ivs == [
        (b"\x00", b"\x00\x10", b"\x01"),
        (b"\x01", b"\x01\x10", b"\x02"),
        (b"\x02", b"\x02\x10", None),
    ]


def test_intervals_multibyte_unsorted_prefix_regression():
    """The reference pairs sorted starts with enumeration-order stops,
    inverting intervals for unsorted prefix tables
    (AbstractRowKeyDistributor.java:51-57 vs the MultiBytesPrefixHash
    enumeration {0317,0137,0237}). The engine sorts both by
    construction: every interval must satisfy start < stop."""
    d = MultiBytePrefixDistributor()  # declared unsorted in the reference
    ivs = distributed_intervals(d, b"\x00", None)
    for i, (p, start, stop) in enumerate(ivs):
        if stop is not None:
            assert start < stop, f"inverted interval at bucket {i}"
    # and the buckets tile the tail of the keyspace in prefix order
    assert [p for p, _, _ in ivs] == sorted(p for p, _, _ in ivs)


def test_identity_prefix_length():
    """0-byte prefix passthrough (_IdentityHashTest.java:21-25)."""
    d = IdentityDistributor()
    assert d.prefix_length == 0
    assert distributed_intervals(d, b"\x10", b"\x20") == [(b"", b"\x10", b"\x20")]


def test_strip_salt_prefix(spark):
    df = spark.createDataFrame(
        [(b"\x01\xaa\xbb",)], T.StructType([T.StructField("sk", T.BinaryType(), False)])
    )
    row = df.select(codec.strip_salt_prefix("sk", 1).alias("k")).collect()[0]
    assert bytes(row.k) == b"\xaa\xbb"
