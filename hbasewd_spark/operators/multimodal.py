"""Multimodal column handling (north-star extension).

Images/audio/video ride through the engine as opaque ``BinaryType``
payload columns plus a typed metadata struct — the same "schema on the
edge, bytes in the middle" stance as the byte-compat key codec. The
Spark-side plumbing here is real (schemas, Arrow batch shapes,
``mapInPandas`` decode operators, partition sizing); the actual codec
call is stubbed (``NotImplementedError``) or replaced by a
deterministic fake, because no image/audio libraries ship in this
container. Swapping ``_fake_decode_batch`` for PIL/ffmpeg is a
one-function change — the distributed plumbing does not move.

At 100 TB: payloads dominate bytes, so the rules are (a) never shuffle
payload columns (project them away before joins/aggs — Spark's column
pruning does this when the plan only references metadata), (b) size
input partitions by bytes not rows (``spark.sql.files.maxPartitionBytes``),
(c) decode in ``mapInPandas`` so one Arrow batch amortizes the Python
boundary over thousands of payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from hbasewd_spark.sources.loaders import load_table

FORMATS = ["png", "jpeg", "webp", "wav"]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = (
    "doc_id long, format string, n_bytes long, width int, height int, "
    "byte_sum long, mean_luma double"
)


def media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from ``documents``: payload = UTF-8
    bytes of the text (a deterministic opaque blob), format derived
    from doc_id. This is the shape a real ingest (S3 image manifest →
    binary column) produces."""
    docs = load_table(spark, sf_dir, "documents")
    fmt = F.element_at(F.array(*[F.lit(x) for x in FORMATS]), (F.col("doc_id") % 4 + 1).cast("int"))
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            fmt.alias("format"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode/feature-extract payloads via ``mapInPandas`` — one Arrow
    batch in, one feature frame out. ``fake=False`` is the seam where a
    real decoder (PIL/torchaudio/ffmpeg) plugs in."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if fake:
                yield _fake_decode_batch(pdf)
            else:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — not available "
                    "in this container; use fake=True for the deterministic stub"
                )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a decoder: derives 'image' properties
    from payload bytes alone, so tests and oracles can verify the
    distributed plumbing end-to-end."""
    n_bytes = pdf["payload"].map(len).astype("int64")
    width = (16 + n_bytes % 240).astype("int32")
    height = (16 + (n_bytes * 7) % 240).astype("int32")
    # integer byte sum (exact, aggregation-safe) + mean as its ratio
    byte_sum = pdf["payload"].map(lambda b: sum(b)).astype("int64")
    mean_luma = byte_sum.astype("float64") / n_bytes.where(n_bytes > 0, 1)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "format": pdf["meta"].map(lambda m: m["format"]),
            "n_bytes": n_bytes,
            "width": width,
            "height": height,
            "byte_sum": byte_sum,
            "mean_luma": mean_luma,
        }
    )


def media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only rollup (payloads pruned from the scan) followed by
    the decoded-feature rollup — the canonical multimodal pipeline
    shape: cheap metadata pass, expensive decode pass, both grouped."""
    decoded = decode_media(media_df(spark, sf_dir))
    # aggregate the exact integer byte_sum, not the per-row double mean:
    # rounding an arbitrary double into a decimal is the one decimal
    # trick that is NOT cross-engine stable (near-tie rows differ)
    return decoded.groupBy("format").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("width").alias("min_width"),
        F.max("height").alias("max_height"),
        (F.sum("byte_sum").cast("double") / F.sum("n_bytes").cast("double")).alias("avg_luma"),
    )


MEDIA_STATS_ORACLE = """
WITH m AS (
  SELECT doc_id,
         ['png','jpeg','webp','wav'][(doc_id % 4 + 1)::INT] AS format,
         octet_length(encode(text)) AS n_bytes,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(string_split(text, ''), ch -> CAST(ascii(ch) AS BIGINT))),
              (a, b) -> a + b) AS byte_sum
  FROM documents
)
SELECT format, count(*) AS n,
       sum(n_bytes) AS total_bytes,
       min(CAST(16 + n_bytes % 240 AS INTEGER)) AS min_width,
       max(CAST(16 + (n_bytes * 7) % 240 AS INTEGER)) AS max_height,
       CAST(sum(byte_sum) AS DOUBLE) / CAST(sum(n_bytes) AS DOUBLE) AS avg_luma
FROM m GROUP BY format
"""
