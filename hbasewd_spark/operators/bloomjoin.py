"""Runtime bloom-filter semi-join reduction (the 100-TB selective-join
path).

The shape: a huge fact table joins a dimension that carries a
selective predicate. A broadcast join is impossible when the filtered
dim is still too big to broadcast, and a plain shuffle join drags
every fact row through the exchange only to drop most of them at the
join. Catalyst's runtime bloom filter (Spark 3.3+) fixes this by
aggregating a bloom of the dim's join keys and pushing a
``might_contain`` filter BELOW the fact side's shuffle — fact rows
that cannot match never enter the exchange.

Spark injects the filter on its own when (a) the creation side has a
selective filter and (b) the application side scan exceeds
``spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold``
(default 10 GB — i.e. at real scale it just happens, which is why the
engine does not hand-roll bloom plumbing). Local test data never
crosses 10 GB, so :func:`runtime_bloom_scope` scopes the thresholds
down to force the same plan locally; the test asserts the
``bloom_filter_agg`` + pushed runtime filter appear and that results
are byte-identical to the plain join.

There is no correctness-registry query for this operator on purpose:
a bloom filter never changes results (false positives only re-admit
rows the join itself drops), so its oracle would be the identical
plain-join SQL; what needs verifying is the PLAN, which
tests/test_bloomjoin.py pins.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

_SCOPE_CONFS = {
    # make the fact side eligible regardless of local scan size
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # let a filtered dim up to 100 MB build the bloom
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # the reduction targets SHUFFLE joins; tiny local dims would
    # otherwise broadcast and hide the plan under test
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def runtime_bloom_scope(spark: SparkSession) -> Iterator[None]:
    """Temporarily scope the session so Catalyst injects its runtime
    bloom-filter semi-join reduction for joins MATERIALIZED inside the
    scope (Spark reads these confs at optimization time, not at
    DataFrame construction — build AND collect inside).

    At 100 TB this scope is a no-op shrunk to documentation: the
    default thresholds already fire for any >10 GB fact scan, with
    broadcast still preferred for genuinely small dims."""
    conf = spark.conf
    saved = {}
    for k, v in _SCOPE_CONFS.items():
        try:
            saved[k] = conf.get(k)
        except Exception:
            saved[k] = None
        conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def has_runtime_bloom(df: DataFrame) -> bool:
    """True iff the query's executed plan carries a runtime
    bloom-filter reduction (creation-side ``bloom_filter_agg`` and an
    application-side ``might_contain`` probe)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "bloom_filter_agg" in plan and "might_contain" in plan.lower()
