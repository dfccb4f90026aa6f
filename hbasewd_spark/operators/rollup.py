"""Hierarchical multi-resolution time rollup (hypertable-style
continuous aggregate), a time-series capability the reference's
timestamp-keyed scan model serves manually (HBaseWD's README use case
is monotonic time-series keys; rollups are what those tables get
queried for).

Spark-first, scale-first shape: the raw table is aggregated ONCE at
the finest resolution (one shuffle over the full data), and every
coarser resolution re-aggregates the previous one — minute → hour →
day. At 100 TB the raw shuffle dominates and coarser levels are
~1/60 and ~1/24 of their parent: total cost ≈ one aggregation pass,
versus 3 full-data shuffles for the naive per-resolution approach.
All measures are chosen to compose losslessly (count/decimal-sum/
min/max), so re-aggregation is exact — the same invariant that makes
incremental (streaming foreachBatch) maintenance of these rollups
correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hbasewd_spark.sources.loaders import load_table

_LEVELS = [("1m", "minute"), ("1h", "hour"), ("1d", "day")]


def time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(resolution, bucket_ts, event_type, n, sum_value, min_value,
    max_value) at minute/hour/day resolutions over `events`."""
    ev = load_table(spark, sf_dir, "events")

    minute = (
        ev.groupBy(
            F.date_trunc("minute", "ts").alias("bucket_ts"), "event_type"
        ).agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sv"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )

    def _up(child: DataFrame, unit: str) -> DataFrame:
        # re-aggregate the previous level: counts and decimal sums add,
        # min/max nest — no precision loss, no second full-data shuffle
        return (
            child.groupBy(
                F.date_trunc(unit, "bucket_ts").alias("bucket_ts"), "event_type"
            ).agg(
                F.sum("n").alias("n"),
                F.sum("sv").alias("sv"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )

    hour = _up(minute, "hour")
    day = _up(hour, "day")

    out = None
    for (tag, _), level in zip(_LEVELS, [minute, hour, day]):
        part = level.select(
            F.lit(tag).alias("resolution"),
            "bucket_ts",
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.col("sv").cast("double").alias("sum_value"),
            "min_value",
            "max_value",
        )
        out = part if out is None else out.unionByName(part)
    return out


TIME_ROLLUP_ORACLE = " UNION ALL ".join(
    f"""
    SELECT '{tag}' AS resolution,
           date_trunc('{unit}', CAST(ts AS TIMESTAMP)) AS bucket_ts,
           event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           min(value) AS min_value, max(value) AS max_value
    FROM events GROUP BY 1, 2, 3
    """
    for tag, unit in _LEVELS
)
