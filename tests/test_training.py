"""Edge cases for operators/training.py beyond the oracle gate: the
two-phase prefix sum must agree with a flat per-language cumsum on
awkward corpora (single doc, empty strings, budget bigger than the
corpus), and shard/familiarity arithmetic must hold at boundaries."""

import pytest
from pyspark.sql import Window, functions as F

from hbasewd_spark.operators.training import (
    N_SHARDS,
    TOKEN_BUDGET,
    shard_plan,
    token_budget_sample,
    unigram_familiarity,
)


def _docs_dir(spark, tmp_path, rows):
    d = str(tmp_path / "sfx")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars int"
    ).write.parquet(d + "/documents.parquet")
    return d


def test_budget_takes_all_when_corpus_small(spark, tmp_path):
    d = _docs_dir(spark, tmp_path, [(1, "one two", "en", "s", 7), (2, "three", "en", "s", 5)])
    out = token_budget_sample(spark, d).collect()
    assert {r.doc_id for r in out} == {1, 2}  # budget >> corpus
    assert sum(r.n_tokens for r in out) == 3


def test_budget_overshoots_by_at_most_one_doc_per_lang(spark, tmp_path):
    # 100 docs x 100 tokens = 10000 tokens in one language; budget 2000
    word = "w " * 100
    rows = [(i, word, "en", "s", len(word)) for i in range(100)]
    d = _docs_dir(spark, tmp_path, rows)
    out = token_budget_sample(spark, d).collect()
    taken = sum(r.n_tokens for r in out)
    assert TOKEN_BUDGET <= taken < TOKEN_BUDGET + 100
    # uniform 100-token docs: the greedy fill takes exactly budget/100
    assert len(out) == TOKEN_BUDGET // 100


def test_budget_skips_empty_docs_consistently(spark, tmp_path):
    d = _docs_dir(
        spark,
        tmp_path,
        [(1, "", "en", "s", 0), (2, "a b c", "en", "s", 5), (3, "   ", "fr", "s", 3)],
    )
    out = token_budget_sample(spark, d).collect()
    # empty-token docs carry n_tokens=0 and never exhaust a budget
    assert {r.doc_id for r in out} >= {2}
    assert all(r.n_tokens >= 0 for r in out)


def test_shard_plan_covers_corpus_exactly_once(spark, sf_dir):
    out = shard_plan(spark, sf_dir).collect()
    from hbasewd_spark.sources.loaders import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in out) == n_docs
    assert all(0 <= r.shard < N_SHARDS for r in out)
    assert all(0 <= r.member_checksum < 2**32 for r in out)


def test_familiarity_bounds(spark, tmp_path):
    # 'a' appears 3x, 'b' once: doc1 = [a a b] -> sum 3+3+1=7, mean 7//3=2
    d = _docs_dir(spark, tmp_path, [(1, "a a b", "en", "s", 5), (2, "a", "en", "s", 1)])
    rows = {r.doc_id: r for r in unigram_familiarity(spark, d).collect()}
    assert rows[1].n_tok == 3 and rows[1].sum_freq == 7 and rows[1].mean_freq == 2
    assert rows[2].n_tok == 1 and rows[2].sum_freq == 3 and rows[2].mean_freq == 3
