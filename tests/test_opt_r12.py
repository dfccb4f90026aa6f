"""Round-12 optimization plan-shape locks (OPTIMIZATION_r12.md): each
test pins the structural property a rewrite bought — fewer corpus
passes, no accidental joins — so a refactor can't silently regress the
plan while staying value-correct."""

from pyspark.sql import functions as F


def _tree(df, spark) -> str:
    """The numbered operator tree of explain('formatted') (details
    blocks repeat node names, so counts must run on the tree only)."""
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    return plan.split("\n\n")[0]


def test_bm25_two_corpus_passes(spark, sf_dir):
    # r12: bm25 derives tf/doclen/df/avgdl from ONE groupBy(doc_id)
    # conditional aggregation; the only remaining corpus references are
    # the scored pass and the 1-row stats broadcast (2 scans, down from
    # 4), and every per-term join is gone — the single join left is the
    # stats cross-broadcast.
    from hbasewd_spark.operators.ranking import bm25_rank

    tree = _tree(bm25_rank(spark, sf_dir), spark)
    assert tree.count("Scan parquet") == 2, tree
    for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
        assert j not in tree, tree


def test_semdedup_single_assignment_pass(spark, sf_dir):
    # r12: the within-cell dedup is a row-local fold over each
    # collected cell, so the broadcast-argmin assignment subtree
    # appears ONCE (two scans total: corpus + centroid seed), and the
    # old pair self-join + members/removed join are gone.
    from hbasewd_spark.operators.similarity import semdedup_summary

    tree = _tree(semdedup_summary(spark, sf_dir), spark)
    assert tree.count("Scan parquet") == 2, tree
    for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
        assert j not in tree, tree
    assert tree.count("Window (") == 1, tree  # the argmin rk only
