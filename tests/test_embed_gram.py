"""Exact-integer Gram matrix (similarity.embed_gram_matrix):
the mapInPandas partial-aggregate path checked against a direct numpy
computation, plus structural and partitioning-independence properties."""

import numpy as np
from pyspark.sql import functions as F

from hbasewd_spark.operators.similarity import DIM, QGRAM_SCALE, embed_gram_matrix
from hbasewd_spark.sources.loaders import load_table


def _expected(sf_dir):
    import duckdb

    e = duckdb.sql(
        f"select embedding from '{sf_dir}/embeddings.parquet' order by vec_id"
    ).df()
    x = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(x * QGRAM_SCALE + 0.5).astype(np.int64)
    return q.T @ q, len(q)


def test_gram_matches_direct_numpy(spark, sf_dir):
    g, n = _expected(sf_dir)
    rows = embed_gram_matrix(spark, sf_dir).collect()
    assert len(rows) == DIM * (DIM + 1) // 2
    for r in rows:
        assert r["n_vecs"] == n
        assert r["sum_qq"] == g[r["i"] - 1, r["j"] - 1], (r["i"], r["j"])


def test_gram_diagonal_nonnegative(spark, sf_dir):
    diag = embed_gram_matrix(spark, sf_dir).where(F.col("i") == F.col("j"))
    assert diag.where(F.col("sum_qq") < 0).count() == 0
    assert diag.count() == DIM


def test_gram_partitioning_independence(spark, sf_dir):
    # the int64 partial-aggregate must be exact under any partitioning;
    # different Arrow batch boundaries must produce identical sums
    from hbasewd_spark.operators.similarity import embed_gram_of

    base = sorted(map(tuple, embed_gram_matrix(spark, sf_dir).collect()))
    emb = load_table(spark, sf_dir, "embeddings").repartition(13)
    again = sorted(map(tuple, embed_gram_of(emb).collect()))
    assert base == again
