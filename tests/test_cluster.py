"""Z-order clustering rewrite (salted_table.cluster): correctness
(row set and salt layout unchanged, validate() clean) and the actual
pruning dividend — per-file spans on the clustered dims shrink vs the
key-sorted layout."""

from pyspark.sql import functions as F

from hbasewd_spark.plans.distributor import HashDistributor
from hbasewd_spark.sources.salted_table import SaltedTable, cluster


def _spans(t: SaltedTable, col: str) -> list[int]:
    return [
        int(r.hi) - int(r.lo)
        for r in t.zone_map(col).collect()
        if r.lo is not None
    ]


def test_cluster_tightens_2d_zone_maps(spark, tmp_path):
    # key-correlated x would be tight already; make x deliberately
    # UNcorrelated with key order so the key-sorted layout's per-file
    # x spans are ~the full domain
    n = 4096
    df = spark.range(n).select(
        F.col("id").alias("key_long"),
        (F.col("id") % 64).cast("int").alias("x"),
        (F.col("id") / 64).cast("int").alias("y"),
    )
    path = str(tmp_path / "zt")
    t = SaltedTable.write(df, path, HashDistributor(4), "key_long")
    before = t.df().orderBy("key_long").collect()
    spans_before = _spans(t, "x")

    cluster(t, "x", "y", files_per_salt=4)

    after = t.df().orderBy("key_long").collect()
    assert [r.key_long for r in after] == [r.key_long for r in before]
    assert [(r.x, r.y) for r in after] == [(r.x, r.y) for r in before]
    assert t.validate().where(F.col("salt") != F.col("expected_salt")).count() == 0
    # layout: more z-sliced files than the key-sorted layout had
    spans_after = _spans(t, "x")
    assert len(spans_after) > len(spans_before)
    # the pruning dividend: every key-sorted file spanned the whole x
    # domain; z-ordered files cover fractions on AVERAGE (slices that
    # straddle a z-quadrant boundary still span fully — that's
    # inherent to range-sliced Morton order, so assert the mean, and
    # that genuinely tight files now exist for the pruner to skip)
    mean_before = sum(spans_before) / len(spans_before)
    mean_after = sum(spans_after) / len(spans_after)
    assert mean_after < 0.8 * mean_before
    assert min(spans_after) <= max(spans_before) // 4


def test_cluster_preserves_scans_and_gets(spark, tmp_path, kv):
    t0 = SaltedTable.write(kv, str(tmp_path / "kvt"), HashDistributor(8), "key_long")
    want = t0.scan(start=1_700_000_000_000, stop=1_700_000_001_000).count()
    got_row = t0.df().limit(1).collect()[0]
    cluster(t0, "val", "write_seq", files_per_salt=2)
    assert t0.scan(start=1_700_000_000_000, stop=1_700_000_001_000).count() == want
    assert t0.point_get(got_row.key_long).count() >= 1
