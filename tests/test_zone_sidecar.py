"""Round-5 lock for the persisted zone-map sidecar (VERDICT r4 item 6):
pruned_scan/expire planning can run off a watermarked parquet sidecar
instead of re-scanning the table, and a stale sidecar is bypassed."""

from pyspark.sql import functions as F

from hbasewd_spark.fsutil import Fs
from hbasewd_spark.plans.distributor import HashDistributor
from hbasewd_spark.sources.kv_fixture import KEY_PREFIX, expected_in_range
from hbasewd_spark.sources.salted_table import SaltedTable


def test_persisted_zone_map_serves_pruned_scan(spark, kv, tmp_path):
    """With a fresh sidecar, pruned_scan plans WITHOUT scanning the
    table column (no zone-map job over the data) and returns exactly
    the live-computed results."""
    t = SaltedTable.write(
        kv,
        str(tmp_path / "zm"),
        HashDistributor(8),
        "key_long",
        zone_map_cols=["key_long", "val"],
    )
    fs = Fs(spark, t.path)
    assert fs.is_dir(f"{t.path}/_zone_maps/key_long")
    assert fs.is_dir(f"{t.path}/_zone_maps/val")

    lo, hi = KEY_PREFIX + 200, KEY_PREFIX + 700
    got = t.pruned_scan("key_long", lo, hi).count()
    assert got == expected_in_range(200, 699)

    # the memoized zone rows must have come from the sidecar: poison
    # the live path by checking the cached rows match the sidecar read
    side = {
        (r.file, r.lo, r.hi, r.n_rows)
        for r in spark.read.parquet(f"{t.path}/_zone_maps/key_long").collect()
    }
    cached = {(r.file, r.lo, r.hi, r.n_rows) for r in t._zone_rows("key_long")}
    assert cached == side and side


def test_stale_zone_sidecar_is_bypassed_after_append(spark, kv, tmp_path):
    """An append after the build must invalidate the sidecar via the
    listing watermark: pruned_scan sees the NEW rows (a trusted stale
    map would silently drop them)."""
    t = SaltedTable.write(
        kv, str(tmp_path / "zmstale"), HashDistributor(4), "key_long",
        zone_map_cols=["key_long"],
    )
    extra = kv.withColumn("key_long", F.col("key_long") + 100_000)
    t._writer(
        extra.withColumn("salt", t.distributor.salt_expr("key_long"))
        .repartition(4, F.col("salt"))
        .sortWithinPartitions("salt", "key_long")
    ).mode("append").save(t.path)
    t.refresh()
    n = t.pruned_scan("key_long", KEY_PREFIX + 100_000, None).count()
    assert n == kv.count()  # every appended row found despite old sidecar


def test_expire_uses_and_survives_zone_sidecar(spark, kv, tmp_path):
    """expire() planning runs off the sidecar when fresh; since round 6
    the verb REBUILDS the sidecar after rewriting files (a bypassed
    stale sidecar is safe but silently demotes every later scan to
    O(data) planning), so the second expiry plans off a fresh sidecar
    again — watermark asserted, not just counts."""
    import json as _json

    t = SaltedTable.write(
        kv, str(tmp_path / "zmexp"), HashDistributor(8), "key_long",
        zone_map_cols=["key_long"],
    )
    stats = t.expire(KEY_PREFIX + 500)
    want = expected_in_range(500, 10**9)
    assert t.df().count() == want
    assert stats["rows_dropped"] == 500 - want
    fs = Fs(spark, t.path)
    meta = _json.loads(
        fs.read_text(f"{t.path}/_zone_maps/key_long/_zone_meta.json")
    )
    assert meta["data_sig"] == t._data_signature(fs)  # rebuilt fresh
    stats2 = t.expire(KEY_PREFIX + 700)
    assert t.df().count() == expected_in_range(700, 10**9)
    assert stats2["rows_dropped"] == want - expected_in_range(700, 10**9)


def test_compact_and_upsert_keep_sidecars_fresh(spark, kv, tmp_path):
    """compact() carries the sidecar dir through the swap and rebuilds
    it against the new files; upsert_rows() rebuilds in place. Both
    asserted via the watermark matching the post-verb data signature."""
    import json as _json

    from hbasewd_spark.sources.salted_table import compact

    t = SaltedTable.write(
        kv, str(tmp_path / "zmlc"), HashDistributor(4), "key_long",
        zone_map_cols=["key_long", "val"],
    )
    fs = Fs(spark, t.path)

    def sig_matches(col):
        meta = _json.loads(
            fs.read_text(f"{t.path}/_zone_maps/{col}/_zone_meta.json")
        )
        return meta["data_sig"] == t._data_signature(fs)

    compact(t)
    assert sig_matches("key_long") and sig_matches("val")
    t.upsert_rows(
        spark.createDataFrame(
            [(b"\x00", KEY_PREFIX + 5, 999, 1)],
            "key binary, key_long long, val int, write_seq long",
        )
    )
    assert sig_matches("key_long") and sig_matches("val")
    # and the fresh sidecar actually serves a correct pruned scan
    n = t.pruned_scan("key_long", KEY_PREFIX + 100, KEY_PREFIX + 200).count()
    assert n == expected_in_range(100, 199)


def test_build_zone_map_refreshes_after_change(spark, kv, tmp_path):
    """Rebuilding after a mutation re-watermarks: the sidecar serves
    again."""
    t = SaltedTable.write(
        kv, str(tmp_path / "zmre"), HashDistributor(4), "key_long",
        zone_map_cols=["key_long"],
    )
    t.expire(KEY_PREFIX + 300)
    t.build_zone_map("key_long")
    fs = Fs(spark, t.path)
    import json as _json

    meta = _json.loads(
        fs.read_text(f"{t.path}/_zone_maps/key_long/_zone_meta.json")
    )
    assert meta["data_sig"] == t._data_signature(fs)
    n = t.pruned_scan("key_long", KEY_PREFIX + 300, KEY_PREFIX + 400).count()
    assert n == expected_in_range(300, 399)


def test_fast_count_matches_scan_count(spark, kv, tmp_path):
    """fast_count == scan().count() for bounded / unbounded / empty /
    single-point ranges, including with NULL keys in the table (nulls
    never match a range predicate; wholly-inside files contribute
    n_rows - n_nulls from pure metadata)."""
    t = SaltedTable.write(
        kv, str(tmp_path / "fc"), HashDistributor(8), "key_long",
        zone_map_cols=["key_long"],
    )
    cases = [
        (None, None),
        (KEY_PREFIX + 100, KEY_PREFIX + 900),
        (KEY_PREFIX + 499, KEY_PREFIX + 500),
        (KEY_PREFIX + 10**9, KEY_PREFIX + 2 * 10**9),  # empty
        (None, KEY_PREFIX + 250),
        (KEY_PREFIX + 750, None),
    ]
    for lo, hi in cases:
        assert t.fast_count(lo, hi) == t.scan(lo, hi, ordered=False).count(), (lo, hi)

    df = spark.createDataFrame(
        [(i if i % 5 else None, f"v{i}") for i in range(200)], "k long, v string"
    )
    tn = SaltedTable.write(df, str(tmp_path / "fcn"), HashDistributor(4), "k")
    for lo, hi in [(None, None), (50, 150), (0, 1)]:
        assert tn.fast_count(lo, hi) == tn.scan(lo, hi, ordered=False).count(), (lo, hi)


def test_fast_count_spark_path_parity(spark, kv, tmp_path, monkeypatch):
    """VERDICT r6 #2b: past the warn threshold fast_count classifies
    via the zone RELATION. Force the Spark path on a real table
    (threshold under the file count) and assert exact scan-count
    parity on the same case matrix — boundary files, nulls,
    unbounded, empty."""
    t = SaltedTable.write(
        kv, str(tmp_path / "fcs"), HashDistributor(8), "key_long",
        zone_map_cols=["key_long"],
    )
    monkeypatch.setattr(SaltedTable, "ZONE_MAP_DRIVER_WARN_FILES", 1)

    def boom(col):
        raise AssertionError("spark fast_count collected zone rows on the driver")

    t._zone_rows = boom
    cases = [
        (None, None),
        (KEY_PREFIX + 100, KEY_PREFIX + 900),
        (KEY_PREFIX + 499, KEY_PREFIX + 500),
        (KEY_PREFIX + 10**9, KEY_PREFIX + 2 * 10**9),
        (None, KEY_PREFIX + 250),
        (KEY_PREFIX + 750, None),
    ]
    for lo, hi in cases:
        assert t.fast_count(lo, hi) == t.scan(lo, hi, ordered=False).count(), (lo, hi)


def test_manifest_relation_from_sidecar(spark, kv, tmp_path):
    """VERDICT r11 #4: the per-table manifest — (salt, file, lo, hi,
    n_rows, n_nulls) readable AS a DataFrame — serves from the fresh
    sidecar with the live zone scan trapped; salt is parsed from the
    Hive path segment and matches every file's directory."""
    import re

    t = SaltedTable.write(
        kv, str(tmp_path / "mf"), HashDistributor(8), "key_long",
        zone_map_cols=["key_long"],
    )

    def boom(col):
        raise AssertionError("manifest fell back to a live zone scan")

    t.zone_map = boom
    rows = t.manifest().collect()
    side = {
        r.file: (r.lo, r.hi, r.n_rows)
        for r in spark.read.parquet(f"{t.path}/_zone_maps/key_long").collect()
    }
    assert len(rows) == len(side) > 0
    for r in rows:
        assert (r.lo, r.hi, r.n_rows) == side[r.file]
        m = re.search(r"salt=(\d+)/", r.file)
        assert m and r.salt == int(m.group(1))
    assert {r.salt for r in rows} == set(range(8))  # every bucket present


def test_manifest_live_fallback_without_sidecar(spark, kv, tmp_path):
    """No sidecar: the manifest comes from one column-pruned scan and
    its per-salt row totals reconcile with the table."""
    t = SaltedTable.write(kv, str(tmp_path / "mfl"), HashDistributor(4), "key_long")
    m = t.manifest("key_long")
    assert m.columns == ["salt", "file", "lo", "hi", "n_rows", "n_nulls"]
    per_salt = {r.salt: r.t for r in m.groupBy("salt").agg(
        F.sum("n_rows").alias("t")).collect()}
    want = {r.salt: r.t for r in t.df().groupBy("salt").agg(
        F.count("*").alias("t")).collect()}
    assert per_salt == want


def test_spark_planning_reads_the_manifest(spark):
    """Routing proof for the manifest seam: past-threshold auto shard
    planning must build its relation through _manifest_of (the same
    relation manifest() exposes), never a driver collect."""
    import json as _json

    from pyspark.sql import functions as SF
    from pyspark.sql.types import StructType

    t = SaltedTable(
        spark, "/tmp/__no_such_table__", HashDistributor(8), "k", "parquet",
        _json.dumps(_json.loads(
            spark.range(1).select(SF.lit(0).cast("long").alias("k")).schema.json()
        )),
    )
    zone = spark.range(150_000).select(
        SF.concat(SF.lit("salt="), SF.col("id") % 8, SF.lit("/f"), SF.col("id")).alias("file"),
        (SF.col("id") * 100).alias("lo"),
        (SF.col("id") * 100 + 50).alias("hi"),
        SF.lit(200).alias("n_rows"),
        SF.lit(0).alias("n_nulls"),
    )
    t._zone_sidecar_df = lambda col: zone

    def boom(col):
        raise AssertionError("driver collected O(#files) zone rows")

    t._zone_rows = boom
    calls = []
    orig = SaltedTable._manifest_of
    t._manifest_of = lambda zdf: (calls.append(1), orig(t, zdf))[1]
    schema = StructType.fromJson(_json.loads(t.data_schema_json))
    desc = t._plan_shards_spark(1000, 900_000, 8, schema, auto=True)
    rows = desc.collect()
    assert calls, "shard planning did not read the manifest relation"
    assert 2 <= len(rows) <= 8 and all(len(r.files) > 0 for r in rows)
    # and fast_count's classification shares the same seam
    calls.clear()
    assert t.fast_count(1000, 2000) == 10 * 200
    assert calls, "fast_count did not read the manifest relation"


def test_fast_count_spark_path_150k_synthetic_files(spark):
    """The 150k-file booby trap extended to fast_count: with a
    synthetic zone relation above the threshold and the driver collect
    trapped, a range covering only wholly-inside files is answered
    from the 1-row aggregate alone — no data I/O, no O(#files)
    driver materialization."""
    import json as _json

    from pyspark.sql import functions as SF

    t = SaltedTable(
        spark, "/tmp/__no_such_table__", HashDistributor(8), "k", "parquet",
        _json.dumps(_json.loads(
            spark.range(1).select(SF.lit(0).cast("long").alias("k")).schema.json()
        )),
    )
    n_files = 150_000
    # disjoint slices [i*100, i*100+50], 200 rows each, 10 nulls each
    zone = spark.range(n_files).select(
        SF.concat(SF.lit("f"), SF.col("id")).alias("file"),
        (SF.col("id") * 100).alias("lo"),
        (SF.col("id") * 100 + 50).alias("hi"),
        SF.lit(200).alias("n_rows"),
        SF.lit(10).alias("n_nulls"),
    )
    t._zone_sidecar_df = lambda col: zone

    def boom(col):
        raise AssertionError("driver collected O(#files) zone rows")

    t._zone_rows = boom
    # files 10..19 wholly inside [1000, 2000): 10 files x 190 keyed rows
    assert t.fast_count(1000, 2000) == 10 * 190
    # unbounded: metadata-only, nulls count (scan applies no predicate)
    assert t.fast_count() == n_files * 200
