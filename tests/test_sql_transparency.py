"""SQL-transparency increment (round-5): plain SQL over the registered
view must prune IDENTICALLY to the typed ``SaltedTable`` facade —
partition filters, pushed filters, and results — so a SQL-only user
pays exactly what a facade user pays (the reference hides salting
behind the stock Scan API, AbstractRowKeyDistributor.java:71-81; here
it hides behind a stock temp view + :meth:`salted_where`)."""

from __future__ import annotations

import datetime
import re

import pytest

from hbasewd_spark.plans.distributor import HashDistributor
from hbasewd_spark.sources.kv_fixture import KEY_PREFIX, kv_df
from hbasewd_spark.sources.salted_table import SaltedTable, sql_literal


def _filescan_filters(df) -> tuple[str, str]:
    """(PartitionFilters, PushedFilters) of the data FileScan,
    normalized: expression ids (#123) stripped so two plans over the
    same table compare equal."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\].*?PushedFilters: \[([^\]]*)\]", plan)
    assert m, plan
    strip = lambda s: re.sub(r"#\d+L?", "", s)
    return strip(m.group(1)), strip(m.group(2))


def test_salted_where_range_prunes_identically_to_scan(spark, tmp_path):
    t = SaltedTable.write(
        kv_df(spark), str(tmp_path / "sqlt"), HashDistributor(8), "key_long"
    )
    t.register_view("kv_sqlt")
    lo, hi = KEY_PREFIX + 100, KEY_PREFIX + 900
    sql_df = spark.sql(f"SELECT * FROM kv_sqlt WHERE {t.salted_where(lo, hi)}")
    facade_df = t.scan(start=lo, stop=hi, ordered=False)

    got = sorted(tuple(r) for r in sql_df.select(*facade_df.columns).collect())
    want = sorted(tuple(r) for r in facade_df.collect())
    assert got == want and len(got) == 400

    sql_part, sql_push = _filescan_filters(sql_df)
    fac_part, fac_push = _filescan_filters(facade_df)
    # identical parquet pushdown: the key range reaches row-group stats
    # in both paths
    assert sql_push == fac_push
    assert "GreaterThanOrEqual(key_long" in sql_push and "LessThan(key_long" in sql_push
    # neither path injects a salt literal for a RANGE (hash salting
    # scatters ranges across all buckets — getDistributedIntervals
    # fan-out); both read all 8 buckets via the same partition filter
    assert ("= " not in sql_part) and ("= " not in fac_part)


def test_sql_point_predicate_prunes_to_same_single_bucket_as_point_get(spark, tmp_path):
    t = SaltedTable.write(
        kv_df(spark), str(tmp_path / "sqlp"), HashDistributor(8), "key_long"
    )
    t.register_view("kv_sqlp")
    k = KEY_PREFIX + 500
    sql_df = spark.sql(f"SELECT * FROM kv_sqlp WHERE key_long = {sql_literal(k)}")
    fac_df = t.point_get(k)

    assert sorted(r.val for r in sql_df.collect()) == sorted(
        r.val for r in fac_df.collect()
    )
    sql_part, _ = _filescan_filters(sql_df)
    fac_part, _ = _filescan_filters(fac_df)
    # both paths carry the SAME constant-folded salt literal — one
    # bucket read, no Catalyst extension needed (ConstantPropagation
    # over the view's salt invariant)
    lit = re.search(r"\(salt = (\d+)\)", fac_part)
    assert lit, fac_part
    assert f"(salt = {lit.group(1)})" in sql_part, sql_part


def test_salted_where_renders_timestamp_and_string_literals(spark, tmp_path):
    rows = [
        (datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i), f"u{i}", i)
        for i in range(48)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user string, v long")
    t = SaltedTable.write(df, str(tmp_path / "tst"), HashDistributor(4), "ts")
    t.register_view("ts_view")
    lo = datetime.datetime(2024, 1, 1, 6)
    hi = datetime.datetime(2024, 1, 1, 18)
    got = spark.sql(
        f"SELECT v FROM ts_view WHERE {t.salted_where(lo, hi)} ORDER BY v"
    ).collect()
    want = t.scan(start=lo, stop=hi, columns=["v"]).collect()
    assert [r.v for r in got] == [r.v for r in want] == list(range(6, 18))
    # literal rendering corner cases
    assert sql_literal("o'brien") == "'o''brien'"
    assert sql_literal(datetime.date(2024, 2, 29)) == "DATE '2024-02-29'"
    assert sql_literal(b"\x01\xff") == "X'01ff'"
    assert sql_literal(True) == "TRUE"
    with pytest.raises(TypeError):
        sql_literal([1, 2])
    # unbounded side and fully-unbounded fragments stay valid SQL
    assert t.salted_where() == "TRUE"
    n_all = spark.sql(f"SELECT count(*) c FROM ts_view WHERE {t.salted_where()}").first().c
    assert n_all == 48
    n_tail = spark.sql(
        f"SELECT count(*) c FROM ts_view WHERE {t.salted_where(start=hi)}"
    ).first().c
    assert n_tail == 48 - 18


def test_sql_literal_tz_aware_under_non_utc_session():
    """A tz-aware datetime must render as the SESSION zone's wall clock
    (Spark interprets TIMESTAMP literals session-locally): the same
    instant renders differently per zone, same instant either way."""
    import datetime

    inst = datetime.datetime(2024, 6, 1, 12, 0, 0, tzinfo=datetime.timezone.utc)
    assert sql_literal(inst) == "TIMESTAMP '2024-06-01 12:00:00.000000'"
    assert (
        sql_literal(inst, "America/New_York")
        == "TIMESTAMP '2024-06-01 08:00:00.000000'"
    )
    # naive input is already session wall clock: passes through
    naive = datetime.datetime(2024, 6, 1, 12, 0, 0)
    assert sql_literal(naive, "America/New_York") == sql_literal(naive)


def test_sql_literal_offset_style_session_zones():
    """Spark accepts java.time offset-style session zones that
    zoneinfo cannot resolve ('GMT+08:00', '+08:00', 'UTC+8', 'Z',
    '-05:30') — ADVICE r6. Each must render the same instant at that
    fixed offset's wall clock instead of raising."""
    import datetime

    inst = datetime.datetime(2024, 6, 1, 12, 0, 0, tzinfo=datetime.timezone.utc)
    plus8 = "TIMESTAMP '2024-06-01 20:00:00.000000'"
    for tz in ("GMT+08:00", "+08:00", "UTC+8", "UT+8", "+0800", "UTC+08:00"):
        assert sql_literal(inst, tz) == plus8, tz
    assert sql_literal(inst, "-05:30") == "TIMESTAMP '2024-06-01 06:30:00.000000'"
    for tz in ("Z", "UTC", "GMT", "UT"):
        assert sql_literal(inst, tz) == "TIMESTAMP '2024-06-01 12:00:00.000000'", tz
    # region ids still resolve through ZoneInfo
    assert (
        sql_literal(inst, "Asia/Tokyo") == "TIMESTAMP '2024-06-01 21:00:00.000000'"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sql_literal(inst, "+25:99:x")


def test_offset_session_zone_end_to_end(spark, tmp_path):
    """salted_where with a tz-aware bound under an offset-style session
    zone ('GMT+08:00') must agree with the typed scan path."""
    import datetime

    import pandas as pd

    base = datetime.datetime(2024, 3, 1, tzinfo=datetime.timezone.utc)
    pdf = pd.DataFrame(
        {
            "ts": [base + datetime.timedelta(hours=i) for i in range(48)],
            "v": list(range(48)),
        }
    )
    df = spark.createDataFrame(pdf)
    t = SaltedTable.write(
        df, str(tmp_path / "ts_off"), HashDistributor(4), "ts"
    )
    lo = base + datetime.timedelta(hours=10)
    hi = base + datetime.timedelta(hours=30)
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "GMT+08:00")
    try:
        t.register_view("ts_off_view")
        n_sql = spark.sql(
            f"SELECT count(*) c FROM ts_off_view WHERE {t.salted_where(start=lo, stop=hi)}"
        ).first().c
        n_typed = t.scan(start=lo, stop=hi).count()
        assert n_sql == n_typed == 20
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
