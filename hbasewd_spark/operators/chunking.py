"""Context-window chunking and sequence packing — the two steps that
turn a curated corpus into model-ready training rows.

Chunking: each document's token stream is cut into overlapping windows
(window=64 tokens, stride=48 -> 16-token overlap), the standard prep
for context-window-bounded training and embedding indexing.

Packing: documents are assigned, in deterministic order, to
fixed-token-budget bins ("sequences") so short documents share a
context window instead of wasting pad tokens. The contract is
sequential prefix-sum packing: doc d lands in
``bin = floor(tokens_before_d / budget)`` within its shard — exactly
the deterministic fill real packing pipelines use, reproducible under
any partitioning because it depends only on (shard, doc_id) order.

Scale notes (100 TB): chunking is embarrassingly parallel (a per-row
generator with no shuffle — the chunk text is built INSIDE the
generator so the token array never rides along with exploded rows).
Packing needs a prefix sum per shard; shards are hash-buckets of
doc_id sized to the cluster (here 32), so each window computes over
|docs|/shards rows and shards scale with executors. No reference
analogue (the reference is a KV salting library; these belong to the
north-star training-data surface, BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from hbasewd_spark.functions.text import sql_tokens, tokens
from hbasewd_spark.sources.loaders import ensure_min_parallelism, load_table

CHUNK_WINDOW = 64
CHUNK_STRIDE = 48
PACK_BUDGET = 512
PACK_SHARDS = 32


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_id, start_tok, n_tokens, chunk_text) — overlapping
    token windows. The generator expression is exploded INLINE (never
    materialized in a projection first) so InferFiltersFromGenerate
    cannot clone the tokenizer into a pushed-down filter (see
    dedup.contamination_check for the measured 7x cost of that trap).
    """
    docs = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark)
    tk = docs.select("doc_id", tokens("text").alias("toks"))
    w, s = CHUNK_WINDOW, CHUNK_STRIDE
    n = F.size(F.col("toks"))
    starts = F.sequence(F.lit(1), F.greatest(n - (w - s), F.lit(1)), F.lit(s))
    chunk = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("start_tok"),
            F.size(F.slice(F.col("toks"), i, w)).alias("n_tokens"),
            F.array_join(F.slice(F.col("toks"), i, w), " ").alias("chunk_text"),
        ),
    )
    return tk.select("doc_id", F.explode(chunk).alias("c")).select(
        "doc_id",
        ((F.col("c.start_tok") - 1) / s).cast("bigint").alias("chunk_id"),
        "c.start_tok",
        "c.n_tokens",
        "c.chunk_text",
    )


def chunking_oracle() -> str:
    toks = sql_tokens("text", "duckdb")
    w, s = CHUNK_WINDOW, CHUNK_STRIDE
    return f"""
    WITH tk AS (SELECT doc_id, {toks} AS toks FROM documents),
    ch AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(toks) - {w - s}, 1), {s}),
               i -> struct_pack(
                 start_tok := i,
                 n_tokens := len(toks[i:least(i + {w - 1}, len(toks))]),
                 chunk_text := array_to_string(toks[i:least(i + {w - 1}, len(toks))], ' ')
               ))) AS c
      FROM tk
    )
    SELECT doc_id,
           CAST((c.start_tok - 1) // {s} AS BIGINT) AS chunk_id,
           c.start_tok AS start_tok,
           c.n_tokens AS n_tokens,
           c.chunk_text AS chunk_text
    FROM ch
    """


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shard, n_tokens, bin, bin_offset) — sequential
    token-budget packing. One window (prefix sum) per shard; the only
    shuffle is the hash partition on shard."""
    docs = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark)
    tk = docs.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(tokens("text")).alias("n_tokens"),
    )
    win = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = tk.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(win), F.lit(0)).cast("bigint").alias("before"),
    )
    # integer `div`, not double division: token prefix sums at 100 TB
    # can exceed 2^53 where double arithmetic starts dropping ulps
    return pre.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.expr(f"before div {PACK_BUDGET}").alias("bin"),
        (F.col("before") % PACK_BUDGET).alias("bin_offset"),
    )


def packing_oracle() -> str:
    toks = sql_tokens("text", "duckdb")
    return f"""
    WITH tk AS (
      SELECT doc_id, doc_id % {PACK_SHARDS} AS shard, len({toks}) AS n_tokens
      FROM documents
    ),
    pre AS (
      SELECT *, CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS before
      FROM tk
    )
    SELECT doc_id, shard, n_tokens,
           before // {PACK_BUDGET} AS bin,
           before % {PACK_BUDGET} AS bin_offset
    FROM pre
    """


# ---------------------------------------------------------------------------
# length-bucketed batching prep
# ---------------------------------------------------------------------------


def length_buckets(spark, sf_dir):
    """Quartile length-bucketing for inference/training batching: token
    counts -> corpus quartile cutoffs (percentile_disc: exact,
    interpolation-free, bit-identical cross-engine) -> bucket id =
    number of cutoffs <= n_tokens (0..3) -> per-bucket profile
    (doc count, token min/max/total). Grouping similar-length docs
    before batching is what keeps padding waste bounded in serving and
    packing pipelines.

    At 100 TB: one slim (doc_id, n_tokens) pass; the cutoffs relation
    is ONE row (broadcast); the rollup shuffles 4 groups."""
    from pyspark.sql import functions as F

    from hbasewd_spark.functions.text import token_count
    from hbasewd_spark.sources.loaders import ensure_min_parallelism, load_table

    docs = ensure_min_parallelism(load_table(spark, sf_dir, "documents"), spark)
    nt = docs.select("doc_id", token_count("text").alias("n_tokens"))
    nt.createOrReplaceTempView("lb_nt")
    cuts = spark.sql(
        """
        SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY n_tokens) AS c1,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY n_tokens) AS c2,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY n_tokens) AS c3
        FROM lb_nt
        """
    )
    bucket = (
        F.when(F.col("n_tokens") >= F.col("c3"), 3)
        .when(F.col("n_tokens") >= F.col("c2"), 2)
        .when(F.col("n_tokens") >= F.col("c1"), 1)
        .otherwise(0)
    )
    return (
        nt.crossJoin(F.broadcast(cuts))
        .select("doc_id", "n_tokens", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_tokens").alias("tok_min"),
            F.max("n_tokens").alias("tok_max"),
            F.sum("n_tokens").alias("tok_total"),
        )
    )


def length_buckets_oracle() -> str:
    from hbasewd_spark.functions.text import sql_token_count

    ntok = sql_token_count("text", "duckdb")
    return f"""
    WITH nt AS (SELECT doc_id, {ntok} AS n_tokens FROM documents),
    cuts AS (
      SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY n_tokens) AS c1,
             percentile_disc(0.50) WITHIN GROUP (ORDER BY n_tokens) AS c2,
             percentile_disc(0.75) WITHIN GROUP (ORDER BY n_tokens) AS c3
      FROM nt
    )
    SELECT (CASE WHEN n_tokens >= c3 THEN 3
                 WHEN n_tokens >= c2 THEN 2
                 WHEN n_tokens >= c1 THEN 1
                 ELSE 0 END) AS bucket,
           count(*) AS n_docs,
           min(n_tokens) AS tok_min,
           max(n_tokens) AS tok_max,
           CAST(sum(n_tokens) AS BIGINT) AS tok_total
    FROM nt, cuts
    GROUP BY 1
    """
