"""PageRank (operators/graph.py) — structural properties the oracle
gate can't see: mass conservation, symmetry, dangling redistribution,
and partitioning-independence of the fixed-point arithmetic."""

import pytest
from pyspark.sql import functions as F

from hbasewd_spark.operators.graph import (
    PR_SCALE,
    pagerank,
    pagerank_event_transitions,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src int, dst int, w bigint")


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node int")


def _ranks(df) -> dict:
    return {r["node"]: r["rank_e9"] for r in df.collect()}


def test_cycle_is_uniform(spark):
    # a 4-cycle is vertex-transitive: every node must get the same rank,
    # and the total mass must stay within floor-loss of PR_SCALE
    e = _edges(spark, [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 0, 1)])
    r = _ranks(pagerank(e, _nodes(spark, range(4)), iters=3))
    assert len(set(r.values())) == 1
    total = sum(r.values())
    assert PR_SCALE - 100 <= total <= PR_SCALE


def test_star_center_dominates(spark):
    # all spokes point at the hub: hub rank must exceed every spoke
    e = _edges(spark, [(i, 0, 1) for i in range(1, 6)])
    r = _ranks(pagerank(e, _nodes(spark, range(6)), iters=3))
    assert r[0] > max(v for k, v in r.items() if k != 0)
    # spokes are symmetric
    assert len({v for k, v in r.items() if k != 0}) == 1


def test_dangling_mass_redistributed(spark):
    # node 1 has no out-edges; its mass must not vanish — total stays
    # within floor-loss of PR_SCALE (each iteration floors at most
    # N + |E| + 1 units)
    e = _edges(spark, [(0, 1, 1)])
    r = _ranks(pagerank(e, _nodes(spark, range(2)), iters=3))
    assert sum(r.values()) >= PR_SCALE - 50
    # the sink (receives 0's mass AND dangling share) outranks the source
    assert r[1] > r[0]


def test_isolated_node_keeps_base_mass(spark):
    # node 2 is isolated (no in- or out-edges): it still receives
    # base + dangling share, never zero
    e = _edges(spark, [(0, 1, 2), (1, 0, 1)])
    r = _ranks(pagerank(e, _nodes(spark, range(3)), iters=3))
    assert r[2] > 0
    assert r[0] > r[2] and r[1] > r[2]


def test_weights_shift_rank(spark):
    # 0 sends 9/10 of its mass to 1 and 1/10 to 2: rank(1) > rank(2)
    e = _edges(spark, [(0, 1, 9), (0, 2, 1), (1, 0, 1), (2, 0, 1)])
    r = _ranks(pagerank(e, _nodes(spark, range(3)), iters=3))
    assert r[1] > r[2]


def test_partitioning_independence(spark):
    # fixed-point integer arithmetic must be bit-identical under any
    # physical partitioning of the edge list
    rows = [(i % 7, (i * 3) % 7, 1 + i % 4) for i in range(40)]
    n = _nodes(spark, range(7))
    a = _ranks(pagerank(_edges(spark, rows).repartition(1), n, iters=3))
    b = _ranks(pagerank(_edges(spark, rows).repartition(13), n, iters=3))
    assert a == b


def test_empty_node_set(spark):
    e = _edges(spark, []).where(F.lit(False))
    out = pagerank(e, _nodes(spark, []), iters=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["node", "rank_e9"]


@pytest.mark.parametrize("iters", [1, 3])
def test_event_transition_query_shape(spark, sf_dir, iters):
    # the registry query: one row per observed props.k, ranks positive,
    # mass conserved within floor loss
    df = pagerank_event_transitions(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    total = sum(r["rank_e9"] for r in rows)
    assert total <= PR_SCALE
    assert total >= PR_SCALE - 10_000  # floor losses only
    assert all(r["rank_e9"] > 0 for r in rows)


def test_driver_and_distributed_paths_agree(spark):
    # the scale-adaptive switch must be invisible in results: force the
    # distributed loop (threshold 0) and compare bit-for-bit with the
    # driver numpy path on a graph with dangling + isolated structure
    rows = [(i % 9, (i * 5) % 9, 1 + i % 3) for i in range(30)]
    e = _edges(spark, rows)
    n = _nodes(spark, range(11))  # 9 and 10 isolated
    a = _ranks(pagerank(e, n, iters=3))
    b = _ranks(pagerank(e, n, iters=3, small_graph_edges=0))
    assert a == b
