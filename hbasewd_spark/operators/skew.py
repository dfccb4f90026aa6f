"""Salting as a general skew remedy — the reference's core idea
(spread a hot key range over N buckets) applied to relational
operators, which is where it pays off at 100 TB.

Two-phase salted aggregation: when a groupBy key is heavily skewed
(one user/tenant dominates), a single hash aggregation funnels the hot
key's rows into one reducer. Salting the key with ``pmod(hash(row), N)``
splits the hot group into N sub-groups (phase 1: partial agg on
(key, salt)), then a second tiny aggregation merges the N partials
(phase 2). Same trick as HBaseWD's write distribution, applied to the
shuffle instead of the region server.

Salted skew join: broadcast-replicate the small side N× with an
explicit salt column, salt the big side's hot keys, equi-join on
(key, salt). AQE's skew-join handles this automatically for sort-merge
joins (enabled in session.py); this operator is the explicit,
planner-independent form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_groupby_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: list[Column],
    merge_aggs: list[Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-resistant aggregation.

    ``aggs`` aggregate raw rows (phase 1, grouped on key+salt);
    ``merge_aggs`` combine the per-salt partials (phase 2, grouped on
    key). Associative aggregates only (sum/count/min/max — the same
    contract as any partial aggregation).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets)).alias("_salt")
    phase1 = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(*aggs)
    return phase1.groupBy(*key_cols).agg(*merge_aggs)


def skewed_user_rollup(spark, sf_dir: str) -> DataFrame:
    """Demonstrator on events: per-user totals through the two-phase
    path — results identical to a direct groupBy (the oracle), plan
    immune to a single user dominating the stream."""
    from hbasewd_spark.sources.loaders import load_table

    ev = load_table(spark, sf_dir, "events")
    return salted_groupby_agg(
        ev,
        ["user_id"],
        aggs=[
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("pv"),
            F.min("ts").alias("pmin"),
            F.max("ts").alias("pmax"),
        ],
        merge_aggs=[
            F.sum("pn").alias("n_events"),
            F.sum("pv").cast("double").alias("sum_value"),
            F.min("pmin").alias("first_ts"),
            F.max("pmax").alias("last_ts"),
        ],
    )


SKEWED_ROLLUP_ORACLE = """
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
       min(CAST(ts AS TIMESTAMP)) AS first_ts,
       max(CAST(ts AS TIMESTAMP)) AS last_ts
FROM events GROUP BY user_id
"""


def salted_skew_join(
    big: DataFrame, small: DataFrame, key: str, buckets: int = 8
) -> DataFrame:
    """Explicit salted join: replicate the small side across ``buckets``
    salt values, salt the big side per-row, join on (key, salt). Use
    when one join key dominates and the small side fits replication
    (otherwise AQE skew-join splitting applies)."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(buckets)).cast("int")
    )
    return big_salted.join(small_rep, [key, "_salt"]).drop("_salt")
