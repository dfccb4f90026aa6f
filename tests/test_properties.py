"""Property-based tests (hypothesis) for the codec and hash layers —
the invariants the whole salted layout rests on, checked over the full
input domain rather than fixtures. Spark evaluation is batched per
property (one job for all examples) to keep runtime sane.
"""

import struct

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F, types as T

from hbasewd_spark.functions import codec
from hbasewd_spark.plans import intervals
from hbasewd_spark.plans.distributor import Hash31Distributor, MultiBytePrefixDistributor


def _jhash(bs: bytes) -> int:
    h = 1
    for b in bs:
        sb = b - 256 if b > 127 else b
        h = ((h * 31 + sb + 2**31) % 2**32) - 2**31
    return h


# collect examples with hypothesis, evaluate in ONE spark job per test
def _batch_eval(spark, values, make_cols, schema):
    df = spark.createDataFrame(values, schema)
    return df.select(*make_cols).collect()


def test_codec_roundtrip_property(spark):
    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    def collect(v):
        vals.append(v)

    vals: list[int] = []
    collect()
    rows = _batch_eval(
        spark,
        [(v,) for v in set(vals)],
        [
            "v",
            codec.encode_long_be("v").alias("enc"),
            codec.decode_long_be(codec.encode_long_be("v")).alias("dec"),
        ],
        "v long",
    )
    for r in rows:
        assert bytes(r.enc) == struct.pack(">q", r.v)
        assert r.dec == r.v


def test_hash31_java_parity_property(spark):
    @settings(max_examples=200, deadline=None)
    @given(st.binary(min_size=0, max_size=24))
    def collect(b):
        vals.append(b)

    vals: list[bytes] = []
    collect()
    uniq = list({v for v in vals})
    rows = _batch_eval(
        spark,
        [(v,) for v in uniq],
        ["key", codec.hash31_bytes("key").alias("h")],
        T.StructType([T.StructField("key", T.BinaryType(), False)]),
    )
    for r in rows:
        assert r.h == _jhash(bytes(r.key)), bytes(r.key).hex()


def test_binary_order_property(spark):
    """Spark BinaryType total order == unsigned-lex (Bytes.compareTo)
    over arbitrary byte strings incl. prefixes/empties."""
    @settings(max_examples=300, deadline=None)
    @given(st.binary(min_size=0, max_size=8))
    def collect(b):
        vals.append(b)

    vals: list[bytes] = []
    collect()
    uniq = list({v for v in vals})
    df = spark.createDataFrame(
        [(v,) for v in uniq], T.StructType([T.StructField("b", T.BinaryType(), False)])
    )
    got = [bytes(r.b) for r in df.orderBy("b").collect()]
    assert got == sorted(uniq)


def test_interval_tiling_property():
    """For any prefix set, stop-less intervals must tile: sorted,
    non-inverted, each stop equal to the next start's prefix — the
    invariant the reference silently violates for unsorted prefixes."""
    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.binary(min_size=2, max_size=2), min_size=1, max_size=8, unique=True),
        st.binary(min_size=0, max_size=4),
    )
    def check(prefixes, start):
        d = MultiBytePrefixDistributor(prefixes=tuple(prefixes))
        ivs = intervals.distributed_intervals(d, start, None)
        ps = [p for p, _, _ in ivs]
        assert ps == sorted(ps)
        for i, (p, lo, hi) in enumerate(ivs):
            assert lo == p + start
            if hi is not None:
                assert lo < hi or (start == b"" and lo == hi) or lo < hi
                assert hi == ps[i + 1]
            else:
                assert i == len(ivs) - 1

    check()


def test_bounded_interval_membership_property():
    """A salted key falls in bucket i's bounded interval iff its
    original key is in [start, stop) — byte-compat interval arithmetic
    agrees with plain comparison."""
    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(min_value=0, max_value=2**32),
        st.integers(min_value=0, max_value=2**32),
        st.integers(min_value=0, max_value=2**32),
    )
    def check(a, b, k):
        start, stop = sorted((a, b))
        if start == stop:
            return
        sb, eb, kb = (struct.pack(">q", x) for x in (start, stop, k))
        d = Hash31Distributor(4)
        ivs = intervals.distributed_intervals(d, sb, eb)
        salt = _jhash(kb) % 4 if _jhash(kb) >= 0 else (_jhash(kb) % 4 + 4) % 4
        p, lo, hi = ivs[salt]
        salted_key = p + kb
        in_interval = lo <= salted_key < hi
        assert in_interval == (start <= k < stop)

    check()
