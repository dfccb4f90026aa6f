"""Lifecycle concurrency (VERDICT r5 next-round #7).

Two pins:
1. the ``_wd_lock`` sentinel: two lifecycle verbs (expire / compact /
   rebucket / upsert_rows) cannot interleave silently — the second
   acquirer fails loudly, and the lock is released on both success and
   in-verb failure;
2. the documented reader anomaly: a reader whose file listing predates
   an ``expire()`` stage-swap MISSES surviving rows — the "run in the
   ingest-quiescent window" contract was prose-only; this makes it a
   failing-if-fixed observation so the docs can never silently drift
   from behavior.
"""

import pytest
from pyspark.sql import functions as F

from hbasewd_spark.fsutil import Fs
from hbasewd_spark.plans.distributor import HashDistributor
from hbasewd_spark.sources.salted_table import SaltedTable, compact


def _table(spark, path, n=400, buckets=4):
    df = spark.range(n).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    return SaltedTable.write(df, path, HashDistributor(buckets), "k")


def _lock_path(t):
    return t.path.rstrip("/") + "/" + SaltedTable.LOCK_FILE


def test_second_lifecycle_verb_fails_loudly_while_locked(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t1"))
    fs = Fs(spark, t.path)
    assert fs.create_atomic(_lock_path(t), '{"verb": "expire", "pid": 1}')
    with pytest.raises(RuntimeError, match="another lifecycle operation"):
        t.expire(before=100)
    with pytest.raises(RuntimeError, match="another lifecycle operation"):
        compact(t)
    with pytest.raises(RuntimeError, match="another lifecycle operation"):
        t.upsert_rows(
            spark.createDataFrame([(1, "x")], "k long, v string")
        )
    # table data was never touched while refused
    assert t.scan().count() == 400
    fs.delete(_lock_path(t))
    stats = t.expire(before=100)  # released lock -> verb proceeds
    assert stats["rows_dropped"] == 100
    assert not fs.exists(_lock_path(t))  # released after success


def test_lock_released_after_in_verb_failure(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t2"))
    fs = Fs(spark, t.path)
    # schema-mismatched changes blow up INSIDE the locked upsert body
    with pytest.raises(Exception, match="wrong_col|UNRESOLVED|cannot resolve"):
        t.upsert_rows(
            spark.createDataFrame([(1, "x")], "k long, wrong_col string")
        )
    assert not fs.exists(_lock_path(t))  # finally released it
    compact(t)  # and the next verb acquires cleanly
    assert t.scan().count() == 400


def test_create_atomic_is_create_if_absent(spark, tmp_path):
    fs = Fs(spark, str(tmp_path))
    p = str(tmp_path / "sentinel")
    assert fs.create_atomic(p, "a") is True
    assert fs.create_atomic(p, "b") is False
    assert fs.read_text(p) == "a"  # loser never overwrites


def test_reader_interleaved_with_expire_misses_surviving_rows(spark, tmp_path):
    """The documented expire() anomaly, pinned: a reader whose file
    listing predates the stage-swap silently misses surviving rows
    (with ignoreMissingFiles=true; with the default false it crashes
    on the deleted originals instead). If a future snapshot mechanism
    fixes this, this test SHOULD fail and the docs change with it."""
    t = _table(spark, str(tmp_path / "t3"))
    stale_reader = t.scan()  # file listing captured at plan time
    prev = spark.conf.get("spark.sql.files.ignoreMissingFiles", "false")
    spark.conf.set("spark.sql.files.ignoreMissingFiles", "true")
    try:
        stats = t.expire(before=200)
        assert stats["rows_dropped"] == 200
        post = t.scan().count()
        assert post == 200  # fresh reader sees exactly the survivors
        stale = stale_reader.count()
        # every boundary file was rewritten under a NEW name, so the
        # stale listing finds only wholly-kept files: survivors from
        # rewritten files are MISSING from the stale read
        assert stale < post, (
            "stale reader saw all survivors — expire() became "
            "reader-atomic; update the documented contract"
        )
    finally:
        spark.conf.set("spark.sql.files.ignoreMissingFiles", prev)
