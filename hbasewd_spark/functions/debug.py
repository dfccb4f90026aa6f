"""DebugUtil parity (P7): bounded table dump with width-based value
sniffing.

The reference's ``DebugUtil.getContent`` scans at most 1000 rows and
stringifies each cell by guessing the type from the byte width — 8
bytes -> long, 4 -> int, else String (DebugUtil.java:38-60, decode
:68-80). The engine keeps typed columns, so this matters only for
byte-compat tables with BinaryType values; the sniffing lives here as
a Column expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from hbasewd_spark.functions.codec import decode_long_be


def sniff_value(col: Column | str) -> Column:
    """Stringify a BinaryType value by byte-width, like DebugUtil:
    8 bytes -> long, 4 -> int, else UTF-8 string."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.octet_length(c)
    as_long = decode_long_be(c).cast("string")
    # conv(...,16,-10) sign-extends at 64 bits; a 4-byte int needs its
    # own two's-complement fold at 2^32
    u32 = F.conv(F.hex(c), 16, 10).cast("bigint")
    as_int = F.when(u32 > 2**31 - 1, u32 - 2**32).otherwise(u32).cast("string")
    as_str = c.cast("string")
    return F.when(n == 8, as_long).when(n == 4, as_int).otherwise(as_str)


def dump(df: DataFrame, key_col: str, value_col: str, limit: int = 1000) -> DataFrame:
    """First ``limit`` rows in key order with sniffed values
    (DebugUtil.java:43 caps at 1000)."""
    return (
        df.orderBy(key_col)
        .limit(limit)
        .select(
            F.lower(F.hex(key_col)).alias("key_hex"),
            sniff_value(value_col).alias("value_str"),
        )
    )
