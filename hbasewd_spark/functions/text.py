"""Text-analysis functions for training-data pipelines (north-star
extension, BASELINE.json): language ID, quality scoring, token
counting, document fingerprinting.

All functions are pure Catalyst column expressions over built-ins
(no UDFs — at 100 TB these run inside whole-stage codegen on the scan),
with deterministic arithmetic that the DuckDB oracle reproduces
bit-for-bit. Each has a DuckDB SQL twin below its definition.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

FNV_MOD = 1_000_000_007
# second independent modulus: a fingerprint collision requires equality
# mod BOTH primes (~2^60 combined space) — a single 1e9+7 hash has a
# ~2^30 space where corpus-scale dedup would silently drop distinct
# documents (birthday bound ~50% at 37k docs)
FNV_MOD2 = 998_244_353

# tiny per-language stopword sets for the n-gram/stopword heuristic —
# deterministic and cheap; a real deployment would swap in fastText etc.
LANG_MARKERS = {
    "en": ["the", "and", "of", "a", "is"],
    "de": ["der", "und", "das", "ist", "ein"],
    "fr": ["le", "et", "la", "est", "un"],
    "es": ["el", "y", "la", "es", "un"],
}


def tokens(col: Column | str) -> Column:
    """Lowercased alphanumeric tokens (the whitespace+punct tokenizer)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda x: x != F.lit(""))


def sql_tokens(expr: str, dialect: str) -> str:
    if dialect == "spark":
        return f"filter(split(lower({expr}), '[^a-z0-9]+'), x -> x != '')"
    return f"list_filter(string_split_regex(lower({expr}), '[^a-z0-9]+'), x -> x != '')"


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def sql_token_count(expr: str, dialect: str) -> str:
    if dialect == "spark":
        return f"size({sql_tokens(expr, dialect)})"
    return f"len({sql_tokens(expr, dialect)})"


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish subword proxy: words + digit runs + punctuation marks
    each count as a token (a cheap, deterministic stand-in for a real
    tokenizer's token count; the regex mirrors GPT-2's coarse classes).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def sql_bpe_ish_token_count(expr: str, dialect: str) -> str:
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    if dialect == "spark":
        return f"regexp_count({expr}, '{pat}')"
    return f"len(regexp_extract_all({expr}, '{pat}'))"


def alpha_ratio(col: Column | str) -> Column:
    """Fraction of characters that are ASCII letters (0 for empty)."""
    c = F.col(col) if isinstance(col, str) else col
    n_alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    return F.when(F.length(c) > 0, n_alpha.cast("double") / F.length(c).cast("double")).otherwise(F.lit(0.0))


def sql_alpha_ratio(expr: str, dialect: str) -> str:
    return (
        f"CASE WHEN length({expr}) > 0 THEN "
        f"CAST(length(regexp_replace({expr}, '[^A-Za-z]', '', 'g')) AS DOUBLE) / CAST(length({expr}) AS DOUBLE) "
        f"ELSE 0.0 END"
        if dialect == "duckdb"
        else f"CASE WHEN length({expr}) > 0 THEN "
        f"CAST(length(regexp_replace({expr}, '[^A-Za-z]', '')) AS DOUBLE) / CAST(length({expr}) AS DOUBLE) "
        f"ELSE 0.0 END"
    )


def _marker_count(c: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(c), F.lit(pat))


def sql_marker_count(expr: str, words: list[str], dialect: str) -> str:
    pat = r"\b(" + "|".join(words) + r")\b"
    if dialect == "spark":
        return f"regexp_count(lower({expr}), '{pat}')"
    return f"len(regexp_extract_all(lower({expr}), '{pat}'))"


def lang_id(col: Column | str) -> Column:
    """Stopword-marker language heuristic: argmax of per-language marker
    counts; 'und' (undetermined) when no marker fires. Ties break by
    language code order (deterministic)."""
    c = F.col(col) if isinstance(col, str) else col
    scored = [(lang, _marker_count(c, ws)) for lang, ws in sorted(LANG_MARKERS.items())]
    best_score = F.greatest(*[s for _, s in scored])
    out = F.lit("und")
    # first language (in sorted order) achieving the max wins
    for lang, s in reversed(scored):
        out = F.when(s == best_score, F.lit(lang)).otherwise(out)
    return F.when(best_score > 0, out).otherwise(F.lit("und"))


def sql_lang_id(expr: str, dialect: str) -> str:
    """Inline (subquery-free, so it works in any select position on
    both engines) twin of :func:`lang_id`."""
    scored = [(lang, sql_marker_count(expr, ws, dialect)) for lang, ws in sorted(LANG_MARKERS.items())]
    greatest = "greatest(" + ", ".join(s for _, s in scored) + ")"
    cases = " ".join(f"WHEN {s} = {greatest} THEN '{lang}'" for lang, s in scored)
    return f"(CASE WHEN {greatest} > 0 THEN CASE {cases} END ELSE 'und' END)"


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic:
    0.4·min(1, tokens/100) + 0.4·alpha_ratio + 0.2·[5 ≤ mean_word_len·10 ≤ 120].
    Pure double arithmetic with a fixed op order (oracle-identical)."""
    c = F.col(col) if isinstance(col, str) else col
    ntok = token_count(c).cast("double")
    len_term = F.least(F.lit(1.0), ntok / F.lit(100.0))
    a_ratio = alpha_ratio(c)
    n_alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", "")).cast("double")
    mean_wl10 = F.when(ntok > 0, n_alpha * F.lit(10.0) / ntok).otherwise(F.lit(0.0))
    wl_ok = F.when((mean_wl10 >= 5.0) & (mean_wl10 <= 120.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.lit(0.4) * len_term + F.lit(0.4) * a_ratio + F.lit(0.2) * wl_ok


def sql_quality_score(expr: str, dialect: str) -> str:
    ntok = f"CAST({sql_token_count(expr, dialect)} AS DOUBLE)"
    if dialect == "duckdb":
        n_alpha = f"CAST(length(regexp_replace({expr}, '[^A-Za-z]', '', 'g')) AS DOUBLE)"
    else:
        n_alpha = f"CAST(length(regexp_replace({expr}, '[^A-Za-z]', '')) AS DOUBLE)"
    a_ratio = sql_alpha_ratio(expr, dialect)
    mean_wl10 = f"(CASE WHEN {ntok} > 0 THEN {n_alpha} * 10.0 / {ntok} ELSE 0.0 END)"
    wl_ok = f"(CASE WHEN {mean_wl10} >= 5.0 AND {mean_wl10} <= 120.0 THEN 1.0 ELSE 0.0 END)"
    return (
        f"0.4 * (CASE WHEN {ntok} / 100.0 < 1.0 THEN {ntok} / 100.0 ELSE 1.0 END) "
        f"+ 0.4 * ({a_ratio}) + 0.2 * {wl_ok}"
    )


def fingerprint(col: Column | str) -> Column:
    """Rolling 31-polynomial hash of the character stream of the
    normalized (lowercased, whitespace-collapsed) text under TWO
    independent prime moduli, combined as ``h1 * M2 + h2`` — a ~60-bit
    content fingerprint stable under trailing-whitespace noise.
    Collision needs agreement mod both primes, so corpus-scale exact
    dedup doesn't silently merge distinct documents."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    chars = F.split(norm, "")
    cps = F.transform(chars, lambda ch: F.ascii(ch).cast("bigint"))
    # SINGLE pass with a struct accumulator: two separate aggregate()
    # calls would inline (and so evaluate) the per-char cps array twice
    # — measured 3x on the curation pipeline. The DuckDB twin keeps the
    # two-reduce form (list_reduce has no struct-friendly init there);
    # same values, and the oracle only needs to be correct, not fast.
    acc0 = F.struct(
        F.lit(7).cast("bigint").alias("a"), F.lit(7).cast("bigint").alias("b")
    )
    return F.aggregate(
        cps,
        acc0,
        lambda acc, cp: F.struct(
            ((acc["a"] * 31 + cp) % FNV_MOD).alias("a"),
            ((acc["b"] * 31 + cp) % FNV_MOD2).alias("b"),
        ),
        lambda acc: acc["a"] * FNV_MOD2 + acc["b"],
    )


def sql_fingerprint(expr: str, dialect: str) -> str:
    if dialect == "spark":
        norm = f"trim(regexp_replace(lower({expr}), '\\\\s+', ' '))"
        cps = f"transform(split({norm}, ''), ch -> CAST(ascii(ch) AS BIGINT))"
        roll = lambda mod: (  # noqa: E731
            f"aggregate({cps}, CAST(7 AS BIGINT), (h, cp) -> (h * 31 + cp) % {mod})"
        )
        return f"({roll(FNV_MOD)} * {FNV_MOD2} + {roll(FNV_MOD2)})"
    norm = f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"
    cps = f"list_transform(string_split({norm}, ''), ch -> CAST(ascii(ch) AS BIGINT))"
    # duckdb list_reduce has no init -> prepend it
    roll = lambda mod: (  # noqa: E731
        f"list_reduce(list_prepend(CAST(7 AS BIGINT), {cps}),"
        f" (h, cp) -> (h * 31 + cp) % {mod})"
    )
    return f"({roll(FNV_MOD)} * {FNV_MOD2} + {roll(FNV_MOD2)})"


# ---------------------------------------------------------------------------
# PII scrubbing (training-data redaction)
# ---------------------------------------------------------------------------

# conservative patterns restricted to the regex subset Java (Spark) and
# RE2 (DuckDB) evaluate identically — no backrefs, no lookaround, and
# no backslash metachars (Spark SQL string literals eat backslashes, so
# [.] / [+] classes keep the pattern embeddable in both SQL dialects)
PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
PII_PHONE = r"[+]?[0-9][0-9 ()-]{6,}[0-9]"


def pii_counts(col: Column | str) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in the text."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.regexp_count(c, F.lit(PII_EMAIL)),
        F.regexp_count(c, F.lit(PII_PHONE)),
    )


def scrub_pii(col: Column | str) -> Column:
    """Redact emails then phones (fixed order — the oracle mirrors it;
    emails go first so their digit runs can't be half-eaten by the
    phone pattern). Pure regexp_replace: stays in codegen on the scan,
    no UDF — at 100 TB this runs at full scan throughput."""
    c = F.col(col) if isinstance(col, str) else col
    no_email = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    return F.regexp_replace(no_email, PII_PHONE, "<PHONE>")


def sql_pii_counts(expr: str, dialect: str) -> tuple[str, str]:
    if dialect == "spark":
        return (
            f"regexp_count({expr}, '{PII_EMAIL}')",
            f"regexp_count({expr}, '{PII_PHONE}')",
        )
    return (
        f"len(regexp_extract_all({expr}, '{PII_EMAIL}'))",
        f"len(regexp_extract_all({expr}, '{PII_PHONE}'))",
    )


def sql_scrub_pii(expr: str, dialect: str) -> str:
    if dialect == "spark":
        return (
            f"regexp_replace(regexp_replace({expr}, '{PII_EMAIL}', '<EMAIL>'),"
            f" '{PII_PHONE}', '<PHONE>')"
        )
    return (
        f"regexp_replace(regexp_replace({expr}, '{PII_EMAIL}', '<EMAIL>', 'g'),"
        f" '{PII_PHONE}', '<PHONE>', 'g')"
    )
