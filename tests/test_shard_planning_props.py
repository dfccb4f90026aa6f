"""Property tests for scan_merged's planning math (round 6): the
quantile boundary cutter and the shard-count sizing are pure driver
functions, so hypothesis can sweep zone geometries no fixture table
would ever produce — overlapping, disjoint, point-mass, null-heavy,
clipped, reversed-request."""

from types import SimpleNamespace as Z

from hypothesis import given, settings, strategies as st

from hbasewd_spark.sources.salted_table import SaltedTable


def zrow(lo, hi, n_rows, n_nulls=0):
    return Z(lo=lo, hi=hi, n_rows=n_rows, n_nulls=n_nulls, file=f"f{lo}-{hi}")


zones = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.integers(min_value=0, max_value=10_000),
        st.integers(min_value=1, max_value=100_000),
        st.integers(min_value=0, max_value=50),
    ).map(lambda t: zrow(min(t[0], t[1]), max(t[0], t[1]), t[2], min(t[3], t[2]))),
    min_size=1,
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(
    zones,
    st.one_of(st.none(), st.integers(min_value=-100, max_value=10_100)),
    st.one_of(st.none(), st.integers(min_value=-100, max_value=10_100)),
    st.integers(min_value=1, max_value=64),
)
def test_quantile_bounds_invariants(rows, start, stop, n_shards):
    """For ANY zone geometry: boundaries are strictly increasing,
    strictly inside (start, stop), inside the clipped zone hull, and
    there are at most n_shards - 1 of them."""
    if start is not None and stop is not None and start > stop:
        start, stop = stop, start
    bounds = SaltedTable._quantile_bounds(rows, start, stop, n_shards)
    assert bounds is not None  # int keys always interpolate
    assert len(bounds) <= max(0, n_shards - 1)
    assert all(b1 < b2 for b1, b2 in zip(bounds, bounds[1:]))
    for b in bounds:
        if start is not None:
            assert b > start
        if stop is not None:
            assert b < stop
    if bounds:
        lo_hull = min(r.lo for r in rows)
        hi_hull = max(r.hi for r in rows)
        assert all(lo_hull <= b <= hi_hull for b in bounds)


@settings(max_examples=200, deadline=None)
@given(zones, st.integers(min_value=2, max_value=16))
def test_quantile_bounds_are_row_balanced_on_uniform_zones(rows, n_shards):
    """When the mixture has real mass, interior cuts exist whenever the
    domain has interior room: a single wide uniform file must be cut
    into n_shards near-equal slices (the salted-layout case that
    degenerated in r5)."""
    wide = [zrow(0, 10_000, 100_000) for _ in range(4)]
    bounds = SaltedTable._quantile_bounds(wide, None, None, n_shards)
    assert len(bounds) == n_shards - 1
    # near-equal spacing for the uniform mixture (within 2% of ideal)
    ideal = 10_000 / n_shards
    edges = [0] + bounds + [10_000]
    for a, b in zip(edges, edges[1:]):
        assert abs((b - a) - ideal) <= max(2, 0.02 * 10_000)


def test_quantile_bounds_empty_and_pointmass_edges():
    # zero usable mass -> no cuts
    assert SaltedTable._quantile_bounds([zrow(5, 5, 10)], None, None, 4) == []
    # all rows null -> weight 0 -> no cuts
    assert (
        SaltedTable._quantile_bounds([zrow(0, 100, 10, n_nulls=10)], None, None, 4)
        == []
    )
    # clip excludes everything -> no cuts
    assert (
        SaltedTable._quantile_bounds([zrow(0, 100, 1000)], 500, 900, 4) == []
    )


@settings(max_examples=300, deadline=None)
@given(
    st.floats(min_value=0, max_value=1e12, allow_nan=False),
    st.integers(min_value=1, max_value=8192),
)
def test_merged_shard_count_monotone_and_bounded(est, par):
    n = SaltedTable._merged_shard_count(est, par)
    assert n >= 1
    # never more shards than one per MIN_ROWS (plus the +1 seed),
    # unless volume demands TARGET-row shards beyond core count
    assert n <= max(
        int(est // SaltedTable.MERGED_SCAN_MIN_ROWS) + 1,
        int(est // SaltedTable.MERGED_SCAN_TARGET_ROWS) + 1,
    )
    # parallelism caps the fan-out until volume exceeds par * TARGET
    if est <= par * SaltedTable.MERGED_SCAN_TARGET_ROWS:
        assert n <= par + 1
    # monotone in est (spot-check against a smaller estimate)
    if est >= 2:
        assert n >= SaltedTable._merged_shard_count(est / 2, par)
