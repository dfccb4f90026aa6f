"""Runtime bloom-filter semi-join reduction: plan-asserted locally at
the thresholds a 100-TB fact scan crosses on its own."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbasewd_spark.operators.bloomjoin import has_runtime_bloom, runtime_bloom_scope
from hbasewd_spark.sources.loaders import load_table


def _join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 9000)
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


def test_bloom_reduction_injected_and_result_identical(spark, sf_dir):
    plain = sorted(tuple(r) for r in _join(spark, sf_dir).collect())
    with runtime_bloom_scope(spark):
        df = _join(spark, sf_dir)
        reduced = sorted(tuple(r) for r in df.collect())
        assert has_runtime_bloom(df), df._jdf.queryExecution().executedPlan().toString()[:2000]
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the probe applies to the FACT side's join key (so non-matching
        # lineitem rows are dropped pre-exchange), and the bloom is
        # built from the dim's key
        assert "might_contain" in plan and "xxhash64(l_suppkey" in plan.split("might_contain", 1)[1][:120]
        assert "bloom_filter_agg(xxhash64(s_suppkey" in plan
    assert reduced == plain
    # scope restored: the same build outside the scope broadcasts again
    assert not has_runtime_bloom(_join(spark, sf_dir))


def test_scope_restores_confs(spark):
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    with runtime_bloom_scope(spark):
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
