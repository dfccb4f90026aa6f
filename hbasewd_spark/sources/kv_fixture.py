"""The reference-shaped ``kv`` fixture (FIXTURES.md §A1).

Mirrors the HBaseWD integration-test data generator
(RowKeyDistributorTestBase.java:138-150): 500 rows, zig-zag values
``val_i = seed + i - i*(i%2)*2`` (500, 499, 502, 497, 504, ...), key =
big-endian 8-byte long of ``key_prefix + val_i``; duplicates are kept
(the oracle counts occurrences). The generator returns the DataFrame
*and* the in-range-count oracle, like the reference's generator returns
the expected count (ref :140-149).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession, types as T

KEY_PREFIX = 1_700_000_000_000  # fixture-pinned (ref uses wall-clock ms, :92)
NUM_ROWS = 500
SEED = 500

KV_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), False),
        T.StructField("key_long", T.LongType(), False),
        T.StructField("val", T.IntegerType(), False),
        T.StructField("write_seq", T.LongType(), False),
    ]
)


def kv_rows(num_rows: int = NUM_ROWS, seed: int = SEED) -> list[tuple]:
    rows = []
    for i in range(num_rows):
        val = seed + i - i * (i % 2) * 2  # zig-zag (ref :142)
        key_long = KEY_PREFIX + val
        key = struct.pack(">q", key_long)  # Bytes.toBytes(long)
        rows.append((key, key_long, val, i))
    return rows


def kv_df(spark: SparkSession, num_rows: int = NUM_ROWS, seed: int = SEED) -> DataFrame:
    return spark.createDataFrame(kv_rows(num_rows, seed), KV_SCHEMA)


def expected_in_range(min_val: int, max_val: int, num_rows: int = NUM_ROWS, seed: int = SEED) -> int:
    """The reference's inline oracle: count of generated ``val`` in
    ``[min_val, max_val]`` inclusive (ref :140-149)."""
    n = 0
    for i in range(num_rows):
        val = seed + i - i * (i % 2) * 2
        if min_val <= val <= max_val:
            n += 1
    return n
