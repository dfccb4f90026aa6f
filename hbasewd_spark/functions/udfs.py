"""User-defined function surface (SURVEY §2.3 UDF/UDAF/UDTF row).

The engine's stance: built-in Catalyst expressions first (every hot
path in this repo is UDF-free); when Python is genuinely needed, only
the Arrow-vectorized forms:

- scalar ``@pandas_udf``     — vectorized per-batch columns
- grouped ``applyInPandas``  — the UDAF/grouped-map form
- ``mapInPandas``            — per-partition batch operators
  (operators/multimodal.py)
- ``applyInPandasWithState`` — custom stateful streaming
  (streaming/ingest.py)
- ``@udtf``                  — table functions (queries.py
  ext_udtf_tokenize)

Row-at-a-time ``F.udf`` is deliberately absent: at 100 TB the ~10-100×
serde overhead versus Arrow batching is the difference between a
pipeline and a bonfire.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


@F.pandas_udf(T.DoubleType())
def zscore_clip(v: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: clip values to ±3 batch-local
    standard deviations (a cheap robust-scaling step). One Arrow batch
    in, one out — no per-row Python."""
    mu, sd = v.mean(), v.std(ddof=0)
    if sd == 0 or pd.isna(sd):
        return v * 0.0
    z = (v - mu) / sd
    return z.clip(-3.0, 3.0)


def trimmed_mean_per_group(
    df: DataFrame, group_cols: list[str], value_col: str, trim: float = 0.1
) -> DataFrame:
    """Grouped-map UDAF via applyInPandas: per-group trimmed mean (drop
    the top/bottom ``trim`` fraction, average the rest) — an aggregate
    no built-in expresses directly. Per group the whole pandas frame is
    in memory, so groups must fit an executor (document the contract;
    for giant groups pre-aggregate or sketch instead)."""
    out_schema = ", ".join(
        [f"{c} {dict(df.dtypes)[c]}" for c in group_cols]
        + ["trimmed_mean double", "n_used long"]
    )

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].sort_values()
        k = int(len(v) * trim)
        used = v.iloc[k : len(v) - k] if len(v) > 2 * k else v
        row = {c: [pdf[c].iloc[0]] for c in group_cols}
        row["trimmed_mean"] = [float(used.mean())]
        row["n_used"] = [len(used)]
        return pd.DataFrame(row)

    return df.groupBy(*group_cols).applyInPandas(agg, schema=out_schema)
