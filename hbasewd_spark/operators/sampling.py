"""Deterministic sampling for large-scale pipelines.

`df.sample()` is seed-stable only per partitioning — a repartition or
AQE re-plan changes which rows are kept, which is unacceptable for
reproducible training-data curation at 100 TB. These operators key the
sampling decision on a *hash of the row's key* instead: membership is
a pure function of the data, stable across partitioning, executors,
retries, and engines (the DuckDB oracle reproduces it bit-for-bit).

This is the same determinism dividend the reference gets from hash
salting (README:75-78 — recomputable placement); applied to sampling
it additionally gives *consistent* samples: the 1% sample is a subset
of the 10% sample, and two tables sampled on the same key sample the
same entities (join-compatible sampling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from hbasewd_spark.functions.codec import md5_long

# basis points of the hash space: md5_long is uniform on [0, 2^32)
_SPACE = 10_000


def sample_bucket(key: Column | str) -> Column:
    """Stable bucket in [0, 10000) — the row's sampling coordinate."""
    c = F.col(key) if isinstance(key, str) else key
    return md5_long(c.cast("string")) % _SPACE


def sql_sample_bucket(expr: str, dialect: str) -> str:
    from hbasewd_spark.functions.codec import sql_md5_long

    return f"({sql_md5_long(f'CAST({expr} AS VARCHAR)', dialect)} % {_SPACE})"


def deterministic_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep ~fraction of rows, decided by hash(key) — partitioning-
    independent, nested (smaller fractions ⊂ larger), join-consistent."""
    return df.where(sample_bucket(key) < int(round(fraction * _SPACE)))


def stratified_sample(df: DataFrame, key: str, stratum: str, fractions: dict[str, float], default: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep all rare classes,
    downsample the head) — the fraction lookup is a CASE expression, so
    the whole filter stays in whole-stage codegen on the scan."""
    bucket = sample_bucket(key)
    thr: Column = F.lit(int(round(default * _SPACE)))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(stratum) == value, F.lit(int(round(frac * _SPACE)))).otherwise(thr)
    return df.where(bucket < thr)


# train/val/test split boundaries in basis points of the hash space
SPLIT_BOUNDS = {"train": (0, 9_000), "val": (9_000, 9_500), "test": (9_500, 10_000)}


def split_assign(key: Column | str) -> Column:
    """'train' / 'val' / 'test' as a pure function of hash(key) —
    the 90/5/5 split every training pipeline needs, with the same
    guarantees as deterministic_sample: partitioning-independent,
    stable across engines and retries, and join-consistent (all rows
    of an entity land in the same split when keyed on the entity)."""
    b = sample_bucket(key)
    out = F.lit("test")
    for name, (lo, hi) in sorted(SPLIT_BOUNDS.items()):
        if name != "test":
            out = F.when((b >= lo) & (b < hi), F.lit(name)).otherwise(out)
    return out


def sql_split_assign(expr: str, dialect: str) -> str:
    from hbasewd_spark.functions.codec import sql_md5_long

    typ = "STRING" if dialect == "spark" else "VARCHAR"
    b = f"({sql_md5_long(f'CAST({expr} AS {typ})', dialect)} % {_SPACE})"
    cases = " ".join(
        f"WHEN {b} >= {lo} AND {b} < {hi} THEN '{name}'"
        for name, (lo, hi) in sorted(SPLIT_BOUNDS.items())
        if name != "test"
    )
    return f"(CASE {cases} ELSE 'test' END)"
