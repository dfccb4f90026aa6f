"""Regression locks for the round-5 code-review findings: two
data-loss paths (expire nulls, orphaned-swap delete), the streaming
redelivery bypass, the short-document gram crash, tz-aware SQL
literals, and the ANSI-safe manifest checksum."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from hbasewd_spark.plans.distributor import HashDistributor
from hbasewd_spark.sources.salted_table import SaltedTable, sql_literal


def test_expire_preserves_nulls_in_fully_expired_files(spark, tmp_path):
    """A file whose NON-NULL keys all predate the cutoff but which also
    holds null-keyed rows must NOT take the metadata-only delete path:
    min/max zone bounds are blind to nulls, so only the n_nulls zone
    column stands between those rows and fs.delete()."""
    rows = [(i, f"v{i}") for i in range(40)] + [(None, "null-a"), (None, "null-b")]
    df = spark.createDataFrame(rows, "key_long long, val string")
    t = SaltedTable.write(df, str(tmp_path / "nx"), HashDistributor(4), "key_long")
    stats = t.expire(before=10**6)  # every non-null key expires
    got = sorted(r.val for r in t.df().collect())
    assert got == ["null-a", "null-b"], got
    assert stats["rows_dropped"] == 40
    # and expiring again is a no-op that still keeps the nulls
    t.expire(before=10**6)
    assert t.df().count() == 2


def test_expire_drop_path_still_metadata_only_without_nulls(spark, tmp_path):
    """The n_nulls guard must not demote genuinely null-free files off
    the cheap delete path."""
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "key_long long, val string"
    )
    t = SaltedTable.write(df, str(tmp_path / "nf"), HashDistributor(4), "key_long")
    stats = t.expire(before=10**6)
    assert stats["files_rewritten"] == 0 and stats["files_dropped"] > 0
    assert t.df().count() == 0


def test_lifecycle_refuses_to_run_over_orphaned_aside_copy(spark, tmp_path):
    """After a failed swap leaves base.old as the ONLY copy, a compact
    or rebucket re-run must refuse (df() would silently read as empty
    and the old delete-then-stage protocol destroyed the last copy)."""
    from hbasewd_spark.fsutil import Fs
    from hbasewd_spark.sources.salted_table import compact, rebucket

    path = str(tmp_path / "orph")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "key_long long, val string"
    )
    t = SaltedTable.write(df, path, HashDistributor(4), "key_long")
    fs = Fs(spark, path)
    # simulate the mid-flight crash: live table moved aside, no base
    assert fs.rename(path, path + ".old")
    with pytest.raises(IOError, match="only copy"):
        compact(t)
    with pytest.raises(IOError, match="only copy"):
        rebucket(t, HashDistributor(8))
    # the aside copy survived both refusals and is manually restorable
    assert fs.rename(path + ".old", path)
    t.refresh()
    assert t.df().count() == 20


def test_neardup_ingest_holds_back_exact_redelivery(spark, tmp_path_factory):
    """At-least-once redelivery: the SAME (doc_id, text) arriving again
    in a later epoch must be held back by its own jaccard=1.0 collision
    — the same-id exclusion must not mask it."""
    from hbasewd_spark.streaming import ingest as ST

    base = tmp_path_factory.mktemp("redeliver")
    src, dest, idx, ckpt = (str(base / d) for d in ("src", "dst", "idx", "ckpt"))
    schema = "doc_id long, text string"
    t1 = "alpha beta gamma delta epsilon zeta " * 10

    def run():
        ST.neardup_corpus_ingest(
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
            dest, idx, ckpt,
        ).awaitTermination()

    spark.createDataFrame([(1, t1)], schema).coalesce(1).write.mode("append").parquet(src)
    run()
    # the exact same document re-delivered as a NEW source file
    spark.createDataFrame([(1, t1)], schema).coalesce(1).write.mode("append").parquet(src)
    run()
    rows = spark.read.parquet(dest).collect()
    assert len(rows) == 1, rows  # no duplicate admission
    assert spark.read.parquet(f"{idx}/hsets").count() == 1  # no double signature


def test_short_documents_survive_gram_pipelines(spark):
    """Documents with fewer tokens than the gram width must produce
    ZERO grams (matching the oracles' empty generate_series), not an
    INVALID_INDEX_OF_ZERO crash from the descending sequence(1, 0)."""
    from hbasewd_spark.operators.dedup import (
        CONTAM_NGRAM,
        _gram_positions,
        features_of_docs,
    )

    docs = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, "a"), (4, "longer " * 20)],
        "doc_id long, text string",
    )
    # shingle pipeline (k=3): doc 4 only
    feats = {r.doc_id: r.hs for r in features_of_docs(docs).collect()}
    assert feats[1] == [] and feats[2] == [] and feats[3] == []
    assert len(feats[4]) > 0
    # positions helper directly at the contamination width
    n = F.size(F.split(F.lit("one two"), " "))
    got = spark.range(1).select(_gram_positions(n, CONTAM_NGRAM).alias("p")).first().p
    assert got == []


def test_contamination_tolerates_short_docs(spark, tmp_path):
    """End-to-end: a corpus containing sub-8-token documents runs the
    contamination check without error and scores only the long docs."""
    import pandas as pd

    out = str(tmp_path / "documents.parquet")
    texts = [
        (0, "tiny doc", "en", "s", 8),
        (7, "seven tokens here but still under the", "en", "s", 38),
        (14, "alpha beta gamma delta epsilon zeta eta theta " * 3, "en", "s", 100),
        (3, "alpha beta gamma delta epsilon zeta eta theta " * 3, "en", "s", 100),
    ]
    pd.DataFrame(texts, columns=["doc_id", "text", "lang", "source", "n_chars"]).to_parquet(out)
    from hbasewd_spark.operators.dedup import contamination_check

    res = contamination_check(spark, str(tmp_path)).collect()
    # doc 3 (train) shares all 8-grams with doc 14 (eval slice: %7==0)
    assert [(r.doc_id, r.n_contaminated > 0) for r in res] == [(3, True)]


def test_sql_literal_timezone_aware_matches_facade(spark, tmp_path):
    """A tz-aware datetime in salted_where must select the same rows
    as the typed scan() with the same value."""
    rows = [
        (datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i), i)
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v long")
    t = SaltedTable.write(df, str(tmp_path / "tz"), HashDistributor(4), "ts")
    t.register_view("tz_view_r5")
    tz9 = datetime.timezone(datetime.timedelta(hours=9))
    lo = datetime.datetime(2024, 1, 1, 15, tzinfo=tz9)   # == 06:00 UTC
    hi = datetime.datetime(2024, 1, 2, 3, tzinfo=tz9)    # == 18:00 UTC
    got = spark.sql(
        f"SELECT v FROM tz_view_r5 WHERE {t.salted_where(lo, hi)} ORDER BY v"
    ).collect()
    want = t.scan(start=lo, stop=hi, columns=["v"]).collect()
    assert [r.v for r in got] == [r.v for r in want] == list(range(6, 18))
    with pytest.raises(ValueError):
        sql_literal(float("nan"))
    with pytest.raises(ValueError):
        sql_literal(float("inf"))


def test_manifest_checksum_decimal_sum_matches_oracle_semantics(spark):
    """The DECIMAL(38,0) checksum sum must equal the plain modular sum
    on a small relation (and by construction cannot overflow-raise at
    any realistic row count under ANSI mode)."""
    from hbasewd_spark.functions.codec import md5_long

    df = spark.createDataFrame([(f"k{i}",) for i in range(1000)], "k string")
    got = (
        df.select(md5_long("k").cast("decimal(38,0)").alias("h"))
        .agg(F.pmod(F.sum("h"), F.lit(2**32)).cast("long").alias("c"))
        .first()
        .c
    )
    import hashlib

    want = sum(int(hashlib.md5(f"k{i}".encode()).hexdigest()[:8], 16) for i in range(1000)) % 2**32
    assert got == want


def test_stream_dedup_ingest_empty_corpus(spark, tmp_path):
    """An empty documents table must yield an empty admitted set (same
    schema), not a TypeError from int(None) bounds."""
    from hbasewd_spark.queries import REGISTRY

    empty_dir = str(tmp_path / "sfempty")
    spark.createDataFrame(
        [], "doc_id bigint, text string, lang string, source string, n_chars int"
    ).write.parquet(empty_dir + "/documents.parquet")
    out = REGISTRY["stream_dedup_ingest"].fn(spark, empty_dir)
    assert out.columns == ["doc_id", "fp"]
    assert out.count() == 0


def test_code_detect_overflow_safe_and_both_branches(spark, tmp_path, sf_dir):
    """A pathological document with >2147 code-punctuation characters
    must not overflow the ppm product (int32 regexp_count widened to
    BIGINT before the 1e6 multiply under ANSI), and the staged slice
    must fire BOTH verdict branches on the shipped prose corpus."""
    from hbasewd_spark.queries import REGISTRY, _CODE_SYM_PPM

    big_dir = str(tmp_path / "sfbig")
    code = "{};()=<>#" * 400  # 3600 code chars
    spark.createDataFrame(
        [(0, code, "en", "s", len(code))],
        "doc_id bigint, text string, lang string, source string, n_chars int",
    ).write.parquet(big_dir + "/documents.parquet")
    row = REGISTRY["ext_code_detect"].fn(spark, big_dir).collect()[0]
    assert row.is_code and 0 < row.sum_sym_ppm <= 1_000_000

    verdicts = {
        r.is_code
        for r in REGISTRY["ext_code_detect"].fn(spark, sf_dir).collect()
    }
    assert verdicts == {True, False}
