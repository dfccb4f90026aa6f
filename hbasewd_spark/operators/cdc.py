"""CDC / upsert / SCD2 emulation (no Delta/Iceberg jars in v1 — the
MERGE INTO semantics are composed from anti-join + union, the classic
pre-lakehouse pattern; swapping in Delta's MERGE later changes the
implementation, not the API).

At 100 TB: the rewrite touches only partitions containing changed keys
when the base table is salt-partitioned (join the change set's salts,
prune the rest) — the same partition-pruning dividend the salted
layout pays everywhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def upsert(base: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """MERGE (matched -> update, unmatched -> insert): keep every base
    row whose key has no change, then append all change rows."""
    return base.join(changes.select(key), key, "left_anti").unionByName(changes)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    tracked: list[str],
    ts_col: str = "effective_ts",
    end_col: str = "end_ts",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the current version of
    each changed key (set end_ts, is_current=false) and append the new
    version as current. Unchanged keys pass through untouched."""
    ch = changes.select(key, *tracked, ts_col)
    changed_keys = ch.select(key)
    untouched = dim.join(changed_keys, key, "left_anti")
    closing = (
        dim.join(ch.select(key, F.col(ts_col).alias("_new_ts")), key)
        .where(F.col(current_col))
        .withColumn(end_col, F.col("_new_ts"))
        .withColumn(current_col, F.lit(False))
        .drop("_new_ts")
    )
    stale_versions = dim.join(changed_keys, key, "left_semi").where(~F.col(current_col))
    new_rows = ch.withColumn(end_col, F.lit(None).cast(dim.schema[end_col].dataType)).withColumn(
        current_col, F.lit(True)
    )
    return untouched.unionByName(stale_versions).unionByName(closing).unionByName(new_rows)
