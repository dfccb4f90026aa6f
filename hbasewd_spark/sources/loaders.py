"""Loaders for the driver-generated test tables (TESTDATA.md).

``events.ts`` is parquet TIMESTAMP(NANOS), which Spark cannot read
natively; the session sets ``spark.sql.legacy.parquet.nanosAsLong`` and
this loader converts to a microsecond TimestampType by truncation —
bit-identical to DuckDB's TIMESTAMP_NS -> TIMESTAMP cast, so oracle
comparisons line up.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_nanos_conf(spark: SparkSession) -> None:
    """The events table is parquet TIMESTAMP(NANOS); Spark refuses it
    unless nanosAsLong is set. It's a runtime-settable SQL conf, so set
    it defensively — the caller's session (e.g. the driver's) may not
    have it at build time. Session timezone is pinned UTC for the same
    reason: timestamp values must render UTC-naive to line up with
    DuckDB oracles regardless of the host session's defaults."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # newer testdata writes TIMESTAMP(MICROS, no-tz); prefer plain
        # TIMESTAMP at scan time so unix_micros/withWatermark accept it
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass  # already set via session builder, or not supported


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Single source of truth for testdata timestamp normalization —
    used by both the batch loader and the streaming reader, so the
    next encoding flip is fixed in exactly one place.

    - ``ts`` stored as bigint: the original TIMESTAMP(NANOS) layout
      read under nanosAsLong — truncate to micros (matches DuckDB's
      ns->us cast).
    - ANY timestamp_ntz column, any table: the round-3 regeneration
      flipped events.ts to timestamp[us] no-tz, which
      unix_micros/withWatermark reject — and the same flip could hit
      o_orderdate/l_shipdate next. Session is pinned UTC, so the cast
      is value-identical to the DuckDB oracle.
      (inferTimestampNTZ=false usually prevents NTZ from surfacing;
      this is the per-column backstop.)"""
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for col_name, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col_name, F.col(col_name).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_nanos_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return normalize_timestamps(df)


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every test table as a temp view for spark.sql queries."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def ensure_min_parallelism(df: DataFrame, spark: SparkSession, target: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the scan yields fewer
    partitions than cores — decouples compute parallelism from input
    file layout for CPU-heavy per-row stages (tokenize/md5/regex).

    The driver testdata is one row group per table, so every scan is
    one task and a 32-core session runs regex pipelines single-threaded
    without this. At 100 TB the condition is false (scans produce
    thousands of splits) and the repartition — which there would be a
    catastrophic full-text shuffle — is skipped entirely."""
    target = target or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(target, 32):
        return df.repartition(min(target, 32))
    return df
