"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship M1 slice (salted write + salt-aware ordered
range scan) at sf0.001. ``queries``/``oracle_sql`` expose the engine's
operator inventory (SURVEY.md §2 + north-star extensions) with DuckDB
oracles; see hbasewd_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from hbasewd_spark.queries import salted_scan_events

    return salted_scan_events(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from hbasewd_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from hbasewd_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()


def tolerance_gates() -> dict[str, dict]:
    """Value gates for by-design oracle-less queries (sketches): exact
    DuckDB [lo, hi] envelopes per value, consumed by
    tools/check_oracles.py. Not part of the driver contract — the
    driver ignores it; the committed SELFCHECK carries the results."""
    from hbasewd_spark.queries import tolerance_gates as _tg

    return _tg()
