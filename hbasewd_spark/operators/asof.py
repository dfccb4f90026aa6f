"""As-of (temporal point-in-time) join — a first-class operator the
reference's sorted-scan model implies but never provides (its ordered
merge scan, DistributedScanner.java:106-139, is exactly the access
pattern a client would hand-roll an as-of lookup on top of).

Spark-first design — the *union trick*, not a range join:

    L(by, t, ...) ⟕asof R(by, t, v)   ("most recent R row at or
                                        before each L row, per key")

    1. tag both inputs and union them (no join!)
    2. one window per `by` key ordered by (t, side, tiebreak)
    3. last_value(ignorenulls) carries the latest R attributes forward
    4. keep only L rows

Cost at 100 TB: ONE shuffle (the window partitionBy) of |L| + |R|
rows — versus a non-equi range join whose candidate space is per-key
quadratic and un-broadcastable when both sides are large. Skewed `by`
keys hit the same limits as any window; salt the key first (operators/
skew.py) if one user dominates.

Ties: an R row at exactly t matches (>= semantics) because R sorts
before L at equal t. Duplicate R rows at the same (by, t) are resolved
deterministically to the one with the greatest tiebreak column before
the union, mirroring what the DuckDB ASOF JOIN oracle is given.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    right_tiebreak: str | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Point-in-time join: for each ``left`` row, attach ``value_cols``
    from the latest ``right`` row with ``right.on <= left.on`` (or the
    earliest with ``>=`` when ``direction='forward'``), matching ``by``.

    ``right`` is first reduced to one row per (by, on) — greatest
    ``right_tiebreak`` wins — so results are partition-order
    independent. ``tolerance`` (a Column producing an interval/long
    compatible with ``on`` subtraction) nulls out matches further back
    than the given distance, pandas ``merge_asof``-style.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    # deterministic dedup of the build side: one row per (by, on)
    if right_tiebreak is not None:
        w_dedup = Window.partitionBy(by, on).orderBy(F.col(right_tiebreak).desc())
        right = (
            right.withColumn("__rn", F.row_number().over(w_dedup))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )

    matched = [f"{c}{suffix}" for c in value_cols]
    on_r = f"{on}{suffix}"

    left_cols = [c for c in left.columns]
    l_tagged = left.select(
        *left_cols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[on].dataType).alias(on_r),
        *[F.lit(None).cast(right.schema[c].dataType).alias(m) for c, m in zip(value_cols, matched)],
    )
    r_tagged = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in (by,)
            else F.col(c)
            for c in left_cols
        ],
        F.lit(0).alias("__side"),
        F.col(on).alias(on_r),
        *[F.col(c).alias(m) for c, m in zip(value_cols, matched)],
    ).withColumn(on, F.col(on_r))

    u = l_tagged.unionByName(r_tagged)

    # backward: R before L at equal t (inclusive >=), carry last R forward.
    # forward: mirror — L before R at equal t, take the first R following.
    if direction == "backward":
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(on).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(on).desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    carried = [F.last(on_r, ignorenulls=True).over(w).alias(on_r)] + [
        F.last(m, ignorenulls=True).over(w).alias(m) for m in matched
    ]
    out = (
        u.select(*left_cols, "__side", *carried)
        .where(F.col("__side") == 1)
        .drop("__side")
    )

    if tolerance is not None:
        far = (
            (F.col(on) - F.col(on_r) > tolerance)
            if direction == "backward"
            else (F.col(on_r) - F.col(on) > tolerance)
        )
        out = out.select(
            *left_cols,
            *[
                F.when(F.col(on_r).isNull() | far, F.lit(None)).otherwise(F.col(m)).alias(m)
                for m in [on_r] + matched
            ],
        )
    return out
