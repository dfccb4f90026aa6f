"""Exact-substring + winnowing dedup (operators/dedup.py) — the
properties the oracle gate can't see: the winnowing detection
guarantee, stop-gram capping, and partitioning-independence."""

from pyspark.sql import functions as F

from hbasewd_spark.operators.dedup import (
    SUB_K,
    WINNOW_MAX_DF,
    WINNOW_W,
    substring_dup_coverage_of,
    substring_dup_spans_of,
    winnow_fingerprints,
)

GUARANTEE_LEN = SUB_K + WINNOW_W - 1  # Schleimer et al. §3: t = k + w - 1


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _distinct_filler(seed: str, n: int) -> str:
    # deterministic non-repeating filler (no 20-gram occurs twice)
    import hashlib

    out = []
    while sum(len(s) for s in out) < n:
        seed = hashlib.md5(seed.encode()).hexdigest()
        out.append(seed)
    return "".join(out)[:n]


def test_winnow_guarantee_shared_span(spark):
    # two documents sharing a span of exactly the guarantee length must
    # share at least one selected fingerprint — regardless of where the
    # span sits in either document
    span = "SHARED-BOILERPLATE-" + "x" * (GUARANTEE_LEN - 19)
    assert len(span) == GUARANTEE_LEN
    a = _distinct_filler("a", 100) + span + _distinct_filler("b", 100)
    b = _distinct_filler("c", 37) + span + _distinct_filler("d", 163)
    fp = winnow_fingerprints(_docs(spark, [a, b]))
    shared = (
        fp.groupBy("h").agg(F.count_distinct("doc_id").alias("nd")).where("nd = 2")
    )
    assert shared.count() >= 1


def test_winnow_short_doc_no_fingerprints(spark):
    # fewer than WINNOW_W k-grams -> no full window -> no fingerprints
    short = "z" * (SUB_K + WINNOW_W - 2)  # W-1 grams
    fp = winnow_fingerprints(_docs(spark, [short]))
    assert fp.count() == 0


def test_winnow_density(spark):
    # selected fingerprints ~ 2/(w+1) of gram positions (the winnowing
    # density bound); allow generous slack but assert real sparsity
    text = _distinct_filler("density", 4000)
    fp = winnow_fingerprints(_docs(spark, [text]))
    n_pos = len(text) - SUB_K + 1
    n_sel = fp.count()
    assert n_sel < n_pos * 0.5
    assert n_sel >= n_pos // (WINNOW_W * 3)


def test_winnow_pairs_stop_gram_cap(spark):
    # content shared by MORE than WINNOW_MAX_DF docs is all stop-grams:
    # it must produce no pairs (the n^2 blowup guard). Identical texts
    # make the selection identical in every doc, so EVERY fingerprint's
    # doc frequency is n_docs > cap and the kept set must be empty.
    text = _distinct_filler("common", 400)
    texts = [text] * (WINNOW_MAX_DF + 4)
    fp = winnow_fingerprints(_docs(spark, texts))
    assert fp.count() > 0  # selection itself produced fingerprints
    rare = (
        fp.groupBy("h")
        .agg(F.count("*").alias("ndocs"))
        .where(F.col("ndocs") <= WINNOW_MAX_DF)
    )
    kept = fp.join(rare.select("h"), "h")
    cross = (
        kept.alias("a")
        .join(
            kept.alias("b"),
            (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .count()
    )
    assert cross == 0


def test_substring_coverage_self_repeat(spark):
    # a 20-char substring repeated twice INSIDE one doc counts as
    # duplicated at both positions
    block = "ABCDEFGHIJKLMNOPQRST"  # exactly SUB_K chars
    assert len(block) == SUB_K
    text = block + _distinct_filler("mid", 60) + block
    out = substring_dup_coverage_of(_docs(spark, [text]))
    row = out.collect()[0]
    assert row["n_dup_pos"] >= 2
    assert row["n_pos"] == len(text) - SUB_K + 1


def test_substring_coverage_unique_doc_zero(spark):
    text = _distinct_filler("unique", 300)
    out = substring_dup_coverage_of(_docs(spark, [text]))
    row = out.collect()[0]
    assert row["n_dup_pos"] == 0
    assert row["dup_permille"] == 0


def test_substring_coverage_partitioning_independence(spark):
    texts = ["shared-prefix-0123456789" + _distinct_filler(str(i), 80) for i in range(20)]
    a = substring_dup_coverage_of(_docs(spark, texts).repartition(1))
    b = substring_dup_coverage_of(_docs(spark, texts).repartition(11))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# duplicated-span removal accounting (substring_dup_spans)
# ---------------------------------------------------------------------------


def test_spans_identical_pair_keeps_canonical(spark):
    # two identical docs: the canonical (doc 0) loses nothing; doc 1's
    # every gram is a non-canonical duplicate -> one span covering the
    # whole text
    text = _distinct_filler("twin", 120)
    out = {r["doc_id"]: r for r in substring_dup_spans_of(_docs(spark, [text, text])).collect()}
    assert out[0]["removed_chars"] == 0 and out[0]["n_dup_spans"] == 0
    assert out[1]["n_dup_spans"] == 1
    assert out[1]["removed_chars"] == len(text)
    assert out[1]["kept_chars"] == 0


def test_spans_two_separate_islands(spark):
    # doc 1 repeats two NON-adjacent blocks of doc 0 with unique filler
    # between -> exactly two spans, each exactly block-sized
    b1 = _distinct_filler("block-one", 40)
    b2 = _distinct_filler("block-two", 40)
    doc0 = b1 + _distinct_filler("pad0", 60) + b2
    doc1 = _distinct_filler("pad1", 50) + b1 + _distinct_filler("pad2", 50) + b2 + _distinct_filler("pad3", 30)
    out = {r["doc_id"]: r for r in substring_dup_spans_of(_docs(spark, [doc0, doc1])).collect()}
    assert out[0]["removed_chars"] == 0
    assert out[1]["n_dup_spans"] == 2
    assert out[1]["removed_chars"] == len(b1) + len(b2)


def test_spans_clean_corpus_all_zero(spark):
    texts = [_distinct_filler(f"clean{i}", 100) for i in range(5)]
    out = substring_dup_spans_of(_docs(spark, texts)).collect()
    assert all(r["removed_chars"] == 0 and r["kept_chars"] == 100 for r in out)
    assert len(out) == 5


def test_no_gram_hash_in_filter_pushdown(spark, sf_dir):
    # regression lock for the InferFiltersFromGenerate pathology: with
    # the gram array staged as a named column, Spark inferred
    # size/isnotnull filters on the attribute and pushdown inlined the
    # ENTIRE md5 gram expression into a Filter below the parallelizing
    # exchange — the hash workload ran twice per row at the scan's
    # partitioning (10s vs 0.7s at sf0.1). The expression must appear
    # only in Project/Generate nodes, never in a Filter condition.
    from hbasewd_spark.operators.dedup import (
        substring_dup_coverage,
        winnow_neardup_pairs,
    )

    for fn in (substring_dup_coverage, winnow_neardup_pairs):
        plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        for block in plan.split("\n\n"):  # formatted blocks: "(n) NodeName"
            first = block.strip().splitlines()[0] if block.strip() else ""
            if ") Filter" in first:
                assert "md5" not in block, (
                    f"{fn.__name__}: gram-hash expression leaked into a "
                    f"Filter node (InferFiltersFromGenerate pushdown "
                    f"regression):\n{block[:500]}"
                )


# ---------------------------------------------------------------------------
# span rewrite (substring_dup_rewrite) — the cleaned-text emitter
# ---------------------------------------------------------------------------


def _py_rewrite(texts: list) -> dict:
    """Pure-Python reference of the Lee-et-al. rewrite — shares NO code
    with the Catalyst fold (hashlib md5, explicit corpus index, python
    island merge + slicing). Canonical occurrence of a duplicated gram
    = corpus-wide minimum (doc_id, position); every other occurrence
    marks its k chars; overlapping/touching marks merge; spans cut."""
    import hashlib

    k = SUB_K
    occ: dict = {}
    grams: dict = {}
    for d, t in enumerate(texts):
        hs = [
            int(hashlib.md5(t[i : i + k].encode("utf-8")).hexdigest()[:8], 16)
            for i in range(max(len(t) - k + 1, 0))
        ]
        grams[d] = hs
        for i, h in enumerate(hs):
            occ.setdefault(h, []).append((d, i + 1))
    out = {}
    for d, t in enumerate(texts):
        marked = [
            i + 1
            for i, h in enumerate(grams[d])
            if len(occ[h]) > 1 and min(occ[h]) != (d, i + 1)
        ]
        spans = []
        prev_max = None
        for i in marked:  # ascending by construction
            if prev_max is None or i > prev_max + (k - 1):
                spans.append([i, i])
            else:
                spans[-1][1] = i
            prev_max = i
        pieces, pos = [], 1
        for s, last_i in spans:
            e = last_i + k - 1
            pieces.append(t[pos - 1 : s - 1])
            pos = e + 1
        pieces.append(t[pos - 1 :])
        out[d] = "".join(pieces)
    return out


def test_rewrite_identical_pair(spark):
    # canonical doc passes through byte-identical; its twin is cut to ""
    from hbasewd_spark.operators.dedup import substring_dup_rewrite_of

    text = _distinct_filler("rwtwin", 120)
    out = {
        r["doc_id"]: r
        for r in substring_dup_rewrite_of(_docs(spark, [text, text])).collect()
    }
    assert out[0]["rewritten_text"] == text and out[0]["kept_chars"] == len(text)
    assert out[1]["rewritten_text"] == "" and out[1]["kept_chars"] == 0


def test_rewrite_cuts_only_duplicated_blocks(spark):
    # doc 1 repeats two non-adjacent blocks of doc 0: the rewrite must
    # remove exactly those blocks and keep doc 1's own filler stitched
    from hbasewd_spark.operators.dedup import substring_dup_rewrite_of

    b1 = _distinct_filler("rwb1", 40)
    b2 = _distinct_filler("rwb2", 40)
    p1, p2, p3 = (
        _distinct_filler("rwp1", 50),
        _distinct_filler("rwp2", 50),
        _distinct_filler("rwp3", 30),
    )
    doc0 = b1 + _distinct_filler("rwpad0", 60) + b2
    doc1 = p1 + b1 + p2 + b2 + p3
    out = {
        r["doc_id"]: r
        for r in substring_dup_rewrite_of(_docs(spark, [doc0, doc1])).collect()
    }
    assert out[0]["rewritten_text"] == doc0
    assert out[1]["rewritten_text"] == p1 + p2 + p3


def test_rewrite_round_trip_vs_spans_accounting(spark):
    # the property the VERDICT asked for: kept_chars of the ACCOUNTING
    # equals the LENGTH of the rewritten text, doc for doc — plus the
    # emitted kept_chars column is that same length
    from hbasewd_spark.operators.dedup import (
        substring_dup_rewrite_of,
        substring_dup_spans_of,
    )

    blk = _distinct_filler("rtblk", 35)
    texts = [
        blk + _distinct_filler(f"rt{i}", 60) + (blk if i % 2 else "")
        for i in range(8)
    ] + ["", "short", blk]
    docs = _docs(spark, texts)
    acct = {r["doc_id"]: r["kept_chars"] for r in substring_dup_spans_of(docs).collect()}
    rw = {r["doc_id"]: r for r in substring_dup_rewrite_of(docs).collect()}
    assert set(acct) == set(rw)
    for d, kept in acct.items():
        assert len(rw[d]["rewritten_text"]) == kept, d
        assert rw[d]["kept_chars"] == kept, d


def test_rewrite_differential_vs_python_reference(spark):
    # hypothesis corpus (small alphabet -> natural cross-doc 20-gram
    # repeats) + engineered twins; the python reference checks the
    # rewritten TEXT byte-for-byte, not just lengths
    from hypothesis import given, settings, strategies as st

    from hbasewd_spark.operators.dedup import substring_dup_rewrite_of

    texts: list = []

    @settings(max_examples=100, deadline=None)
    @given(st.text(alphabet="ab .", min_size=0, max_size=120))
    def collect(t):
        texts.append(t)

    collect()
    texts.append(texts[-1] + texts[0])  # engineered shared spans
    texts.append(texts[0])
    want = _py_rewrite(texts)
    got = {
        r["doc_id"]: r["rewritten_text"]
        for r in substring_dup_rewrite_of(_docs(spark, texts)).collect()
    }
    assert got == want


def _py_winnow(text: str) -> set:
    """Pure-Python winnowing reference — shares NO code with the
    Catalyst implementation (hashlib md5, explicit window loop); the
    differential twin the codec tests use for spec conformance."""
    import hashlib

    k, w, pack = SUB_K, WINNOW_W, 1 << 30
    n = len(text)
    if n < k:
        return set()
    hs = [
        int(hashlib.md5(text[i : i + k].encode("utf-8")).hexdigest()[:8], 16)
        for i in range(n - k + 1)
    ]
    sel = set()
    for j in range(len(hs) - w + 1):
        packed = min(hs[j + t] * pack + (j + t + 1) for t in range(w))
        sel.add(packed // pack)
    return sel


def test_winnow_differential_vs_python_reference(spark):
    # hypothesis collects texts (small alphabet -> natural 20-gram
    # repeats within and across docs), ONE Spark job evaluates, the
    # python reference checks every selected fingerprint set
    from hypothesis import given, settings, strategies as st

    texts: list[str] = []

    @settings(max_examples=120, deadline=None)
    @given(st.text(alphabet="ab .", min_size=0, max_size=120))
    def collect(t):
        texts.append(t)

    collect()
    # engineered shared spans on top of the generated corpus
    texts.append(texts[-1] + texts[0])
    docs = _docs(spark, texts)
    got: dict = {i: set() for i in range(len(texts))}
    for r in winnow_fingerprints(docs).collect():
        got[r["doc_id"]].add(r["h"])
    for i, t in enumerate(texts):
        assert got[i] == _py_winnow(t), f"doc {i}: {t!r}"


def test_winnow_index_probe_matches_direct_join(spark, tmp_path):
    # building the persisted index then probing must equal the direct
    # (batch x corpus) fingerprint join with the corpus-side cap
    from hbasewd_spark.operators.dedup import (
        WINNOW_MIN_SHARED,
        build_winnow_index,
        probe_winnow_index,
    )

    span = _distinct_filler("sharedspan", 80)
    corpus_texts = [span + _distinct_filler(f"c{i}", 120) for i in range(4)]
    batch_texts = [span + _distinct_filler("b0", 90), _distinct_filler("b1", 200)]
    corpus = _docs(spark, corpus_texts)
    batch = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch_texts)],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "wnidx")
    build_winnow_index(spark, corpus, path)
    got = {
        (r["new_doc_id"], r["corpus_doc_id"]): r["n_shared"]
        for r in probe_winnow_index(spark, batch, path).collect()
    }
    # batch doc 100 shares the span with every corpus doc; 101 with none
    assert all((100, c) in got for c in range(4))
    assert not any(new == 101 for new, _ in got)
    assert all(n >= WINNOW_MIN_SHARED for n in got.values())
    # probing again off the persisted relation is deterministic
    again = {
        (r["new_doc_id"], r["corpus_doc_id"]): r["n_shared"]
        for r in probe_winnow_index(spark, batch, path).collect()
    }
    assert got == again


def test_xxhash_production_knob(spark):
    # the xxhash64 path is the production hash (not oracle-reproducible);
    # it must preserve the operator's STRUCTURE: identical docs still
    # produce identical fingerprint sets, distinct-filler docs share
    # nothing, and the winnowing guarantee holds
    span = _distinct_filler("xxspan", GUARANTEE_LEN)
    a = _distinct_filler("xa", 80) + span + _distinct_filler("xb", 80)
    b = _distinct_filler("xc", 40) + span + _distinct_filler("xd", 120)
    clean = _distinct_filler("xe", 200)
    fp = winnow_fingerprints(_docs(spark, [a, b, clean]), hash_fn="xxhash64")
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["h"])
        assert 0 <= r["h"] < (1 << 32)  # packing headroom holds
    assert by_doc[0] & by_doc[1]  # shared span -> shared fingerprint
    assert not (by_doc[0] & by_doc[2]) and not (by_doc[1] & by_doc[2])
    import pytest

    with pytest.raises(ValueError):
        winnow_fingerprints(_docs(spark, [a]), hash_fn="sha1")


def test_winnow_pairs_single_selection_pass(spark, sf_dir):
    # r12 optimization lock: pair generation is groupBy(h) +
    # row-local a<b expansion of the collected doc array — NOT a
    # keep-vs-keep self-join, which materialized the whole
    # scan -> gram-hash -> window-min selection subtree twice (two
    # parquet scans in the plan) and paid an extra global distinct
    # exchange on (doc_id, h). The plan must read the corpus once and
    # contain no join at all.
    from hbasewd_spark.operators.dedup import winnow_neardup_pairs

    plan = winnow_neardup_pairs(spark, sf_dir)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    tree = plan.split("\n\n")[0]  # the numbered operator tree
    assert tree.count("Scan parquet") == 1, tree
    assert "Join" not in tree, tree


def test_winnow_fingerprints_shuffle_free(spark):
    # the selection pipeline (gram hashes -> packed window-min ->
    # per-doc h dedup) is row-local end to end: array_distinct inside
    # the row replaced the old global .distinct() on (doc_id, h), so a
    # bare fingerprint scan plans with zero exchanges.
    fp = winnow_fingerprints(_docs(spark, ["abc" * 50, "xyz" * 40]))
    plan = fp._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree, tree
