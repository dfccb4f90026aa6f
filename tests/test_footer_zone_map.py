"""Footer-statistics zone maps (VERDICT r7 #1).

``build_zone_map`` now reads per-file lo/hi/n_rows/n_nulls from parquet
FOOTERS (a metadata pass) instead of scanning the column. Pins:

1. footer-derived zones are IDENTICAL to scan-derived zones on every
   fixture key type (long, timestamp, date, string, double, nullable);
2. types whose stats pyarrow cannot decode (FLBA decimal) flip
   ``_stats_ok`` and ``_zone_source`` falls back to the column scan —
   the sidecar is right either way;
3. the consumers (fast_count / pruned_scan / expire / scan_merged)
   produce exact results on a footer-built sidecar;
4. the footer path is the one actually taken on a plain salted write
   (booby-trap: the scan-based ``zone_map`` raises).
"""

import datetime

import pytest
from pyspark.sql import functions as F

from hbasewd_spark.plans.distributor import HashDistributor
from hbasewd_spark.sources.salted_table import SaltedTable


def _canon(zdf):
    return sorted(
        (SaltedTable._canon_file_uri(r.file), r.lo, r.hi, r.n_rows, r.n_nulls)
        for r in zdf.collect()
    )


@pytest.fixture(scope="module")
def typed_table(spark, tmp_path_factory):
    df = spark.range(2000).select(
        F.col("id").alias("k"),
        (F.to_timestamp(F.lit("2024-01-01")) + F.make_interval(mins=F.col("id"))).alias("ts"),
        F.date_add(F.to_date(F.lit("2024-01-01")), (F.col("id") % 365).cast("int")).alias("d"),
        F.concat(F.lit("s"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("s"),
        (F.col("id") * 1.5).alias("x"),
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id")).alias("nullable"),
        F.col("id").cast("decimal(18,4)").alias("dec"),
    )
    path = str(tmp_path_factory.mktemp("fzm") / "t")
    return SaltedTable.write(df, path, HashDistributor(4), "k")


@pytest.mark.parametrize("col", ["k", "ts", "d", "s", "x", "nullable"])
def test_footer_zones_equal_scan_zones(spark, typed_table, col):
    t = typed_table
    fdf = t._footer_zone_map(col)
    assert fdf.where(~F.col("_stats_ok")).count() == 0
    assert _canon(fdf.drop("_stats_ok")) == _canon(t.zone_map(col))


def test_undecodable_stats_fall_back_to_scan(spark, typed_table):
    """pyarrow cannot extract FLBA decimal stats: every file flips
    ``_stats_ok`` and ``_zone_source`` returns the scan relation."""
    t = typed_table
    fdf = t._footer_zone_map("dec")
    assert fdf.where(~F.col("_stats_ok")).count() == fdf.count() > 0
    src, done = t._zone_source("dec")
    try:
        assert _canon(src) == _canon(t.zone_map("dec"))
    finally:
        done()
    # and a built sidecar (scan-backed) still serves pruning correctly
    t.build_zone_map("dec")
    assert t._zone_sidecar_df("dec") is not None


def test_write_builds_sidecar_from_footers_not_scan(spark, tmp_path, monkeypatch):
    """The plain salted-write path (``zone_map_cols=[key]``) must take
    the footer route: booby-trap the scan-based zone_map so any
    column-scan fallback explodes."""
    df = spark.range(500).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )

    def boom(self, col):
        raise AssertionError("column-scan zone_map called on a footer-able table")

    monkeypatch.setattr(SaltedTable, "zone_map", boom)
    t = SaltedTable.write(
        df, str(tmp_path / "t"), HashDistributor(4), "k", zone_map_cols=["k"]
    )
    assert t._zone_sidecar_df("k") is not None
    assert t.fast_count(100, 400) == 300
    assert t.pruned_scan("k", 100, 400).count() == 300


def test_footer_sidecar_serves_all_consumers_exactly(spark, tmp_path):
    ts0 = datetime.datetime(2024, 1, 1)
    df = spark.range(3000).select(
        (F.to_timestamp(F.lit("2024-01-01")) + F.make_interval(secs=F.col("id") * 37)).alias("ts"),
        F.col("id").alias("v"),
    )
    t = SaltedTable.write(
        df, str(tmp_path / "t"), HashDistributor(8), "ts", zone_map_cols=["ts"]
    )
    lo = ts0 + datetime.timedelta(hours=3)
    hi = ts0 + datetime.timedelta(hours=20)
    expect = t.scan(lo, hi).count()
    assert expect > 0
    assert t.fast_count(lo, hi) == expect
    assert t.pruned_scan("ts", lo, hi).count() == expect
    merged = t.scan_merged(start=lo, stop=hi).toPandas()
    assert len(merged) == expect
    assert merged["ts"].is_monotonic_increasing
    stats = t.expire(before=lo)
    assert stats["rows_dropped"] == 3000 - t.scan().count()
    assert t.scan().count() == df.where(F.col("ts") >= lo).count()


def test_footer_zones_with_all_null_file(spark, tmp_path):
    """A file whose indexed column is ALL null has no min/max stats but
    a full null_count — footer zones must report (None, None, n, n)
    exactly like the scan path, keeping expire()'s null-preservation
    contract."""
    df = spark.range(400).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 200, None).otherwise(F.col("id")).alias("maybe"),
    )
    # one file per salt; salt on k so some files get the all-null slice
    t = SaltedTable.write(df, str(tmp_path / "t"), HashDistributor(2), "k")
    fdf = t._footer_zone_map("maybe")
    assert fdf.where(~F.col("_stats_ok")).count() == 0
    assert _canon(fdf.drop("_stats_ok")) == _canon(t.zone_map("maybe"))


def test_streaming_epochs_keep_sidecar_alive(spark, tmp_path, monkeypatch):
    """VERDICT r7 #2: the epoch commit maintains fresh zone-map
    sidecars incrementally (footer stats of the epoch's files appended
    under the commit lock), so a continuously-streaming table keeps
    its metadata path. Three epochs land, then an epoch REPLAY (purge
    + re-append); after each, fast_count and scan_merged must run with
    the live column scan booby-trapped."""
    from hbasewd_spark.streaming.ingest import idempotent_salted_batch_write

    base = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = SaltedTable.write(
        base, str(tmp_path / "t"), HashDistributor(4), "k", zone_map_cols=["k"]
    )

    def boom(self, col):
        raise AssertionError("sidecar went stale: live zone scan invoked")

    monkeypatch.setattr(SaltedTable, "zone_map", boom)

    hi = 1000
    for epoch in (1, 2, 3):
        batch = spark.range(hi, hi + 500).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        idempotent_salted_batch_write(batch, epoch, t.path, t.distributor, "k")
        hi += 500
        t.refresh()
        assert t._zone_sidecar_df("k") is not None, f"stale after epoch {epoch}"
        assert t.fast_count(0, hi) == hi
        assert t.fast_count(700, 1600) == min(hi, 1600) - 700
    # replay epoch 2: purge (sidecar rows dropped) + re-append, exact
    batch2 = spark.range(1500, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    idempotent_salted_batch_write(batch2, 2, t.path, t.distributor, "k")
    t.refresh()
    assert t._zone_sidecar_df("k") is not None
    assert t.fast_count(0, 10**9) == 2500  # exactly-once after replay
    merged = t.scan_merged(start=900, stop=1800).toPandas()
    assert len(merged) == 900
    assert merged["k"].is_monotonic_increasing


def test_epoch_on_stale_sidecar_leaves_it_stale(spark, tmp_path):
    """An epoch landing on a sidecar that was ALREADY stale must not
    restamp it fresh — that would vouch for files the sidecar never
    saw. The watermark keeps it bypassed; results stay exact via the
    live path."""
    from hbasewd_spark.fsutil import Fs
    from hbasewd_spark.streaming.ingest import idempotent_salted_batch_write

    base = spark.range(500).select(F.col("id").alias("k"), F.col("id").alias("v"))
    t = SaltedTable.write(
        base, str(tmp_path / "t"), HashDistributor(4), "k", zone_map_cols=["k"]
    )
    # out-of-band append (no sidecar maintenance) -> sidecar goes stale
    extra = spark.range(500, 600).select(F.col("id").alias("k"), F.col("id").alias("v"))
    from hbasewd_spark.sources.salted_table import salted

    salted(extra, t.distributor, "k").write.mode("append").partitionBy(
        "salt"
    ).parquet(t.path)
    t.refresh()
    assert t._zone_sidecar_df("k") is None  # stale as expected
    # epoch commit on top: maintenance must SKIP (pre_sig mismatch)
    batch = spark.range(600, 700).select(F.col("id").alias("k"), F.col("id").alias("v"))
    idempotent_salted_batch_write(batch, 1, t.path, t.distributor, "k")
    t.refresh()
    assert t._zone_sidecar_df("k") is None  # still stale, never lied
    assert t.fast_count(0, 10**9) == 700  # live path stays exact


def test_zone_source_footer_branch_is_single_pass(spark, typed_table, monkeypatch):
    """VERDICT r8 #1: the footer pass must run ONCE per build. On the
    default (driver) route the rows are already materialized in a
    LocalRelation — single-pass and job-free by construction. On the
    executor route (forced here) the relation must be persist()-ed so
    the ``_stats_ok`` probe and the caller's write/collect share ONE
    O(#files x footer) job, and ``done()`` releases it."""
    t = typed_table
    src, done = t._zone_source("k")
    try:
        plan = src._jdf.queryExecution().optimizedPlan().toString()
        assert "LocalRelation" in plan, plan
    finally:
        done()
    monkeypatch.setattr(SaltedTable, "FOOTER_DRIVER_MAX_FILES", 0)
    src, done = t._zone_source("k")
    try:
        plan = src._jdf.queryExecution().optimizedPlan().toString()
        assert "InMemoryRelation" in plan, plan
        # consuming it twice hits the cache, not two footer jobs
        assert src.count() == src.count() > 0
    finally:
        done()
    # done() unpersisted the backing relation: a fresh plan of the same
    # lineage no longer reads from cache
    fdf = t._footer_zone_map("k")
    assert "InMemoryRelation" not in fdf._jdf.queryExecution().optimizedPlan().toString()


@pytest.mark.parametrize("col", ["k", "ts", "s", "nullable"])
def test_driver_and_executor_footer_routes_identical(
    spark, typed_table, col, monkeypatch
):
    """r9: small local file sets read footers ON THE DRIVER (zero
    Spark jobs — the job launch dominated salted_write at bench
    scale); large/remote sets take the mapInArrow executor route. Both
    call the same `_footer_stats_batch`, and must yield identical
    rows AND identical Spark schemas (the sidecar parquet files they
    write are interchangeable)."""
    t = typed_table
    drv = t._footer_zone_map(col)
    monkeypatch.setattr(SaltedTable, "FOOTER_DRIVER_MAX_FILES", 0)
    exe = t._footer_zone_map(col)
    assert "mapInArrow" not in drv._jdf.queryExecution().analyzed().toString()
    assert drv.schema == exe.schema
    assert _canon(drv.drop("_stats_ok")) == _canon(exe.drop("_stats_ok"))


def test_driver_footer_route_launches_no_jobs(spark, typed_table):
    """The whole point of the driver route: building the footer
    relation and collecting it must not run a single Spark job (a
    LocalRelation collect is driver-side in classic mode)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    fdf = typed_table._footer_zone_map("k")
    rows = fdf.collect()
    assert len(rows) > 0
    after = tracker.getJobIdsForGroup(None)
    assert before == after, "driver footer route launched Spark jobs"
