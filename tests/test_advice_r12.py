"""Round-12 regression locks for the ADVICE.md r11 findings not already
covered in test_pagerank.py (int-typed weight widening, NULL-k
filtering, the iters parametrize): the winnow incremental index's
on-disk lifecycle and the Gram matrix's widened cross-partition
accumulator."""

import os

from pyspark.sql import functions as F


def test_winnow_incremental_dirs_are_tracked_and_cleaned(spark, sf_dir):
    """ADVICE r11: winnow_incremental used to write under a fixed /tmp
    path and never clean up — attestation sweeps accumulated parquet
    dirs. The dirs are now tracked and removed by clear_dedup_caches
    (and at interpreter exit)."""
    from hbasewd_spark.operators import dedup as DD

    assert DD.winnow_incremental(spark, sf_dir).count() >= 0
    assert DD._WNIDX_DIRS, "index dir was not tracked"
    roots = list(DD._WNIDX_DIRS)
    assert all(os.path.isdir(r) for r in roots)
    DD.clear_dedup_caches()
    assert not DD._WNIDX_DIRS
    assert not any(os.path.isdir(r) for r in roots), "index dirs survived cleanup"


def test_gram_cross_partition_sum_is_decimal_widened(spark, sf_dir):
    """ADVICE r11: the corpus-wide qq_part sum shares the per-row 1e12
    worst case, so an int64 accumulator can wrap silently past ~9e12
    rows while the DuckDB oracle sums in HUGEINT. The reduce must run
    in decimal(38,0) (overflow -> NULL, loud) and land back on bigint
    in the output schema."""
    from hbasewd_spark.operators.similarity import embed_gram_of
    from hbasewd_spark.sources.loaders import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(32)
    out = embed_gram_of(emb)
    assert dict(out.dtypes)["sum_qq"] == "bigint"
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "decimal(38,0)" in plan, plan


def test_dedup_feature_cache_evicts_on_new_sf_dir(spark, sf_dir, tmp_path):
    """VERDICT r11 #2 (dedup side): a second sf_dir through the cached
    feature pipeline must leave at most ONE persisted frame per cache,
    with the evicted frame actually unpersisted."""
    from hbasewd_spark.operators import dedup as DD

    DD.clear_dedup_caches()
    try:
        first = DD._cached_features(spark, sf_dir)
        assert first.storageLevel.useMemory
        # a second corpus under a different sf_dir path
        sf2 = str(tmp_path / "sf_alt")
        os.makedirs(sf2, exist_ok=True)
        spark.createDataFrame(
            [(i, f"doc text number {i} alpha beta gamma", "en", "web")
             for i in range(30)],
            "doc_id bigint, text string, lang string, source string",
        ).write.mode("overwrite").parquet(f"{sf2}/documents.parquet")
        DD._cached_features(spark, sf2)
        assert len(DD._FEATS_CACHE) == 1
        assert list(DD._FEATS_CACHE) == [(spark.sparkContext.applicationId, sf2)]
        assert not first.storageLevel.useMemory
    finally:
        DD.clear_dedup_caches()
