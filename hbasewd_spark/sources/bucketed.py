"""Bucketed tables — shuffle-free co-located joins (SURVEY §2.3 /
SCALE.md).

``bucketBy(n, key)`` at write time hash-partitions files by key so a
later equi-join of two tables bucketed the same way needs NO exchange:
Spark zips bucket i with bucket i. This is the batch-join twin of the
salted-table idea (pre-pay one shuffle at write, amortize it over every
subsequent join) and the strategy you'd use for the repeated
fact⋈fact joins of a 100 TB pipeline (orders⋈lineitem on orderkey).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 8, sort: bool = True
) -> None:
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    # a managed-table location can survive a previous session whose
    # in-memory catalog is gone; clear both catalog entry and location
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{table.lower()}", ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def cocluster_join(
    spark: SparkSession, left: str, right: str, key: str, force_smj: bool = False
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key —
    plan contains zero shuffle exchanges (asserted in tests).

    ``force_smj`` pins the sort-merge strategy; at test scale the
    planner would otherwise broadcast the small side (which also skips
    the shuffle, but doesn't demonstrate bucket co-location — at
    100 TB neither fact side is broadcastable and SMJ-over-buckets is
    the plan this layout exists for)."""
    l, r = spark.table(left), spark.table(right)
    if force_smj:
        l = l.hint("merge")
    return l.join(r, key)
