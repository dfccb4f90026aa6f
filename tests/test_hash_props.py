"""Port of OneByteSimpleHashTest (hash property tests) with the
evenness assertion fixed to use real float tolerance (the reference's
integer-division tolerance only fails at >=100% deviation,
OneByteSimpleHashTest.java:96-99 — SURVEY.md §5)."""

import random
import struct

import pytest
from pyspark.sql import functions as F, types as T

from hbasewd_spark.functions import codec
from hbasewd_spark.plans.distributor import Hash31Distributor, HashDistributor


def _jhash(bs: bytes) -> int:
    """Python reference of the Java 31-polynomial
    (RowKeyDistributorByHashPrefix.java:102-106)."""
    h = 1
    for b in bs:
        sb = b - 256 if b > 127 else b
        h = ((h * 31 + sb + 2**31) % 2**32) - 2**31
    return h


def _random_keys(n=1000, seed=42):
    rng = random.Random(seed)
    return [bytes(rng.randrange(256) for _ in range(3)) for _ in range(n)]


@pytest.fixture(scope="module")
def keys_df(spark):
    schema = T.StructType([T.StructField("key", T.BinaryType(), False)])
    return spark.createDataFrame([(k,) for k in _random_keys()], schema).cache()


@pytest.mark.parametrize("mod", [256, 10])
def test_domain_closure(keys_df, mod):
    """1000 random keys land in the declared prefix domain
    (OneByteSimpleHashTest.java:19-65)."""
    rows = keys_df.select(codec.hash31_bucket("key", mod).alias("b")).collect()
    assert all(0 <= r.b < mod for r in rows)


def test_determinism_and_java_parity(keys_df):
    """Same key -> same hash (ref :39-40,:63-64), and bit-parity with
    the Java arithmetic."""
    rows = keys_df.select("key", codec.hash31_bytes("key").alias("h")).collect()
    for r in rows:
        assert r.h == _jhash(bytes(r.key))
    again = keys_df.select("key", codec.hash31_bytes("key").alias("h")).collect()
    assert {bytes(r.key): r.h for r in rows} == {bytes(r.key): r.h for r in again}


@pytest.mark.parametrize(
    "buckets,rows_per_bucket",
    [(32, 55), (37, 13), (255, 20), (256, 20), (256, 1), (1, 200), (1, 1)],
)
def test_evenness(spark, buckets, rows_per_bucket):
    """Bucket sizes within tolerance of the mean for sequential int
    keys (ref :72-100) — with real float tolerance. The 31-polynomial
    over sequential big-endian ints is near-perfectly uniform, so a
    ±50% band is a structural check, not a statistical one."""
    n = buckets * rows_per_bucket
    keys = [(struct.pack(">i", i),) for i in range(n)]
    df = spark.createDataFrame(keys, T.StructType([T.StructField("key", T.BinaryType(), False)]))
    counts = (
        df.select(codec.hash31_bucket("key", buckets).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    by_bucket = {r.b: r["count"] for r in counts}
    mean = n / buckets
    for b in range(buckets):
        got = by_bucket.get(b, 0)
        assert abs(got - mean) <= max(1.0, 0.5 * mean), (b, got, mean)


def test_abs_bug_semantics(keys_df):
    """abs_bug=True reproduces Java `Math.abs(h) % mod` exactly
    (including its sign behavior); default pmod always lands in
    domain (SURVEY.md O5)."""
    rows = keys_df.select(
        "key",
        codec.hash31_bucket("key", 10, abs_bug=True).alias("compat"),
        codec.hash31_bucket("key", 10).alias("native"),
    ).collect()
    for r in rows:
        h = _jhash(bytes(r.key))
        java_abs = h if h == -(2**31) else abs(h)
        # Java % truncates toward zero; python % floors -> use math.fmod-like
        expect = java_abs - (java_abs // 10) * 10 if java_abs >= 0 else -((-java_abs) % 10)
        assert r.compat == expect
        assert 0 <= r.native < 10


def test_native_hash_evenness(spark):
    """Engine-native xxhash64 salting disperses a monotonic key run
    (the hot-spot workload, README:9-18)."""
    df = spark.range(10_000)
    d = HashDistributor(32)
    counts = df.select(d.salt_expr("id").alias("s")).groupBy("s").count().collect()
    assert len(counts) == 32
    for r in counts:
        assert abs(r["count"] - 10_000 / 32) < 0.3 * 10_000 / 32


def test_integer_min_value_key_bit_for_bit(spark):
    """The reference's Math.abs(Integer.MIN_VALUE) bug, reproduced on a
    real key: hash31(0xcbf72f826252e070) == Integer.MIN_VALUE (found by
    solving 31^8 + Σ 31^(8-i)·b_i ≡ MIN (mod 2^32)). Byte-compat mode
    must yield the Java result — a NEGATIVE bucket outside the declared
    domain (RowKeyDistributorByHashPrefix.java:107) — while the engine-
    native pmod fix keeps it in-domain."""
    key = bytes.fromhex("cbf72f826252e070")
    assert _jhash(key) == -(2**31)
    df = spark.createDataFrame(
        [(key,)], T.StructType([T.StructField("key", T.BinaryType(), False)])
    )
    row = df.select(
        codec.hash31_bytes("key").alias("h"),
        codec.hash31_bucket("key", 10, abs_bug=True).alias("compat"),
        codec.hash31_bucket("key", 10).alias("native"),
    ).collect()[0]
    assert row.h == -(2**31)
    # Java: Math.abs(MIN_VALUE) == MIN_VALUE; MIN_VALUE % 10 == -8
    assert row.compat == -8
    assert 0 <= row.native < 10
