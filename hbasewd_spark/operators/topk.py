"""Global top-k without an unbounded single-partition window.

The anti-pattern this module replaces::

    df.withColumn("rk", row_number().over(Window.orderBy(...))).where(rk <= k)

plans a WindowExec with an empty partition spec whose input is the
ENTIRE relation — Spark funnels every row through one task ("No
Partition Defined for Window operation" warning). At 100 TB that task
is the job.

``global_topk`` makes the scale-safe plan explicit instead of relying
on the optimizer's LimitPushDownThroughWindow rewrite:

1. ``orderBy(...).limit(k)`` plans ``TakeOrderedAndProject`` — each
   input partition keeps a local k-row heap and only k rows per
   partition ever move (map-side partial top-k, the same shape as a
   partial aggregation).
2. The rank stamp needs no window at all: the limit's output is a
   single ordered partition (partition index 0) by construction, so
   ``monotonically_increasing_id()`` — partition_index << 33 | offset —
   enumerates exactly 0..k-1 in row order. A ``sortWithinPartitions``
   guard pins the in-partition order; Catalyst's EliminateSorts drops
   it when the child is already ordered (the normal case).

No WindowExec anywhere in the plan — a plan test asserts this for
every ranked query in the registry.

The ordering must be total (include a unique tiebreak column) so the
stamped ranks are deterministic and oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def global_topk(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    rk_name: str | None = "rk",
) -> DataFrame:
    """Top-``k`` rows of ``df`` under a total order, with an optional
    1-based rank column stamped on the bounded result.

    ``order_cols`` must define a total order (tie-break on a key
    column) for deterministic output.
    """
    top = df.orderBy(*order_cols).limit(k)
    if rk_name is None:
        return top
    return top.sortWithinPartitions(*order_cols).withColumn(
        rk_name, (F.monotonically_increasing_id() + 1).cast("int")
    )
