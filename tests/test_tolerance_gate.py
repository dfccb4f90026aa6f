"""Tolerance-gate evaluation (VERDICT r8 #2): check_oracles.py now
consumes ``tolerance_gates()`` — the gate SQL's exact DuckDB [lo, hi]
envelopes must contain every Spark value. Pure-pandas unit pins (no
Spark session): pass, out-of-envelope fail, NaN fail, key-set drift
fail; plus the registry wiring (the declared gate references real
result/envelope columns)."""

import duckdb
import pandas as pd
import pytest

from tools.check_oracles import eval_tolerance_gate


@pytest.fixture()
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        "('A', 10), ('A', 20), ('B', 30), ('B', 50)) v(g, x)"
    )
    return c


GATE = {
    "keys": ["g"],
    "sql": (
        "SELECT g, CAST(sum(x) * 0.9 AS DOUBLE) AS s_lo, "
        "CAST(sum(x) * 1.1 AS DOUBLE) AS s_hi FROM t GROUP BY g"
    ),
    "checks": [("s", "s_lo", "s_hi")],
}


def test_gate_pass_inside_envelope(con):
    spark_pdf = pd.DataFrame({"g": ["A", "B"], "s": [31.0, 78.0]})
    ok, record = eval_tolerance_gate(GATE, spark_pdf, con)
    assert ok and "2/2" in record


def test_gate_fail_outside_envelope(con):
    spark_pdf = pd.DataFrame({"g": ["A", "B"], "s": [31.0, 95.0]})
    ok, record = eval_tolerance_gate(GATE, spark_pdf, con)
    assert not ok and "outside" in record and "95.0" in record


def test_gate_fail_on_nan(con):
    spark_pdf = pd.DataFrame({"g": ["A", "B"], "s": [31.0, float("nan")]})
    ok, record = eval_tolerance_gate(GATE, spark_pdf, con)
    assert not ok


def test_gate_fail_on_key_drift(con):
    # a group the envelope has but Spark lost (or vice versa) must fail
    spark_pdf = pd.DataFrame({"g": ["A"], "s": [31.0]})
    ok, record = eval_tolerance_gate(GATE, spark_pdf, con)
    assert not ok and "keys differ" in record


def test_registry_gate_columns_exist():
    """The declared rel_approx_stats gate must reference real columns:
    value columns from the Spark query's schema contract, lo/hi columns
    from the envelope SQL."""
    from hbasewd_spark.queries import tolerance_gates, REGISTRY

    gates = tolerance_gates()
    assert "rel_approx_stats" in gates
    g = gates["rel_approx_stats"]
    env_cols = duckdb.connect().sql(
        "SELECT * FROM (" + g["sql"].replace("lineitem",
            "(SELECT 'N' l_returnflag, 1 l_orderkey, 1.0 l_extendedprice)") + ")"
    ).columns
    for val, lo, hi in g["checks"]:
        assert lo in env_cols and hi in env_cols
    assert all(k in env_cols for k in g["keys"])
    # every gate name is a registered oracle-less query
    for name in gates:
        assert name in REGISTRY and not REGISTRY[name].oracle
