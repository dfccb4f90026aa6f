"""Byte-compat key codecs and the reference's 31-polynomial hash.

The engine keeps keys as *typed* columns (long/timestamp/binary) and the
salt as its own column; byte-level fidelity with HBaseWD (big-endian
key encoding, ``prefix ‖ key`` concatenation, the exact 31-polynomial
hash incl. its ``Math.abs(Integer.MIN_VALUE)`` bug) lives here, at the
edge, so the hot path stays Catalyst-optimizable.

Reference semantics replicated:
- ``Bytes.toBytes(long)`` big-endian encode — used for keys in
  RowKeyDistributorTestBase.java:144-146.
- 31-polynomial hash ``h=1; h=31*h+b`` over signed bytes with int32
  wraparound, then ``Math.abs(h) % mod`` —
  RowKeyDistributorByHashPrefix.java:102-108. ``Math.abs`` of
  ``Integer.MIN_VALUE`` is negative, so one key in 2^32 lands in a
  negative (unscannable) bucket; the engine-native path fixes this with
  ``pmod`` and the byte-compat path can reproduce it bit-for-bit
  (``abs_bug=True``).

Every helper here comes in two shapes: a PySpark ``Column`` builder and
a *portable SQL text* builder (dialects: ``spark`` and ``duckdb``) so
the DuckDB correctness oracle can evaluate the identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

INT32_MIN = -(2**31)
U32 = 2**32

# ---------------------------------------------------------------------------
# Big-endian long <-> 8-byte binary (Bytes.toBytes(long) compat)
# ---------------------------------------------------------------------------


def encode_long_be(col: Column | str) -> Column:
    """8-byte big-endian two's-complement encoding of a BIGINT.

    Bit-compatible with HBase ``Bytes.toBytes(long)``; unsigned-lex
    order of the bytes matches numeric order for non-negative longs
    (the only kind the reference's tests use — timestamps).
    """
    c = F.col(col) if isinstance(col, str) else col
    # hex(bigint) renders the full 16-nibble two's complement for
    # negatives and drops leading zeros for positives -> lpad.
    return F.unhex(F.lpad(F.hex(c), 16, "0"))


def decode_long_be(col: Column | str) -> Column:
    """Inverse of :func:`encode_long_be` (signed)."""
    c = F.col(col) if isinstance(col, str) else col
    # conv(,16,-10) interprets the 64-bit pattern as signed decimal.
    return F.conv(F.hex(c), 16, -10).cast("bigint")


def encode_int_be(col: Column | str) -> Column:
    """4-byte big-endian encoding of an INT (Bytes.toBytes(int))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unhex(F.lpad(F.hex(c.cast("bigint").bitwiseAND(F.lit(0xFFFFFFFF))), 8, "0"))


def concat_salted_key(prefix: Column, key: Column) -> Column:
    """``Bytes.add(prefix, originalKey)`` — the physical salted key
    (RowKeyDistributorByOneBytePrefix.java:49)."""
    return F.concat(prefix, key)


def strip_salt_prefix(salted: Column | str, prefix_len: int) -> Column:
    """``getOriginalKey`` for the byte-compat layer — drop the first
    ``prefix_len`` bytes (RowKeyDistributorByOneBytePrefix.java:55-58;
    0-length identity passthrough per _IdentityHashTest.java:21-25)."""
    c = F.col(salted) if isinstance(salted, str) else salted
    if prefix_len == 0:
        return c
    return F.substring(c, prefix_len + 1, 2**31 - 1 - prefix_len)


# ---------------------------------------------------------------------------
# 31-polynomial hash (RowKeyDistributorByHashPrefix.OneByteSimpleHash)
# ---------------------------------------------------------------------------


def _wrap32(x: Column) -> Column:
    """Emulate Java int32 two's-complement wraparound on a BIGINT col."""
    return F.pmod(x + F.lit(-INT32_MIN), F.lit(U32)) + F.lit(INT32_MIN)


def hash31_bytes(binary_col: Column | str) -> Column:
    """The raw 31-polynomial Java hash of a BinaryType column
    (``h=1; for b in bytes: h=31*h+b`` over *signed* bytes, int32
    wraparound) — RowKeyDistributorByHashPrefix.java:102-106.

    Pure Catalyst expression (no UDF): split the hex rendering into
    byte pairs, fold with int32-wrap arithmetic.
    """
    c = F.col(binary_col) if isinstance(binary_col, str) else binary_col
    pairs = F.split(F.hex(c), r"(?<=\G..)")  # Java regex: every 2 chars
    bytes_arr = F.filter(pairs, lambda p: p != F.lit(""))
    signed = F.transform(
        bytes_arr,
        lambda p: F.when(F.conv(p, 16, 10).cast("bigint") > 127, F.conv(p, 16, 10).cast("bigint") - 256)
        .otherwise(F.conv(p, 16, 10).cast("bigint")),
    )
    return F.aggregate(signed, F.lit(1).cast("bigint"), lambda h, b: _wrap32(h * 31 + b))


def hash31_bucket(binary_col: Column | str, buckets: int, abs_bug: bool = False) -> Column:
    """Bucket index = ``abs(hash31) % buckets`` (reference, buggy for
    Integer.MIN_VALUE) or ``pmod(hash31, buckets)`` (engine-native fix).
    Reference: RowKeyDistributorByHashPrefix.java:107 (abs), :76-80 (use).
    """
    h = hash31_bytes(binary_col)
    if abs_bug:
        # Java: Math.abs(Integer.MIN_VALUE) == Integer.MIN_VALUE (neg).
        a = F.when(h == INT32_MIN, F.lit(INT32_MIN)).otherwise(F.abs(h))
        return (a % buckets).cast("int")
    return F.pmod(h, F.lit(buckets)).cast("int")


# ---------------------------------------------------------------------------
# Portable SQL text builders (spark + duckdb dialects)
# ---------------------------------------------------------------------------


def sql_wrap32(x: str) -> str:
    """Portable int32-wraparound SQL over BIGINT arithmetic."""
    return f"((({x}) % {U32} + {U32 + 2**31}) % {U32} - {2**31})"


def sql_hash31_of_long(key: str, buckets: int) -> str:
    """Portable SQL: 31-polynomial hash of the 8 big-endian bytes of a
    BIGINT expression, bucketed with pmod semantics. Identical text runs
    on Spark SQL and DuckDB (pure integer arithmetic), so it serves both
    the engine query and the oracle. Mirrors hashBytes over
    Bytes.toBytes(long) (RowKeyDistributorByHashPrefix.java:102-108).
    """
    h = "1"
    for i in range(8):
        shift = 8 * (7 - i)
        b = f"((({key}) >> {shift}) & 255)"
        sb = f"({b} - 256 * (CASE WHEN {b} > 127 THEN 1 ELSE 0 END))"
        h = sql_wrap32(f"{h} * 31 + {sb}")
    return f"((({h}) % {buckets} + {buckets}) % {buckets})"


def sql_md5_long(expr: str, dialect: str) -> str:
    """Portable deterministic 32-bit hash of a string expression:
    the first 8 hex digits of md5, as BIGINT (0 .. 2^32-1). Used by
    dedup / fingerprint operators where both engines must agree."""
    if dialect == "spark":
        return f"cast(conv(substr(md5({expr}), 1, 8), 16, 10) as bigint)"
    if dialect == "duckdb":
        return f"cast(concat('0x', substr(md5({expr}), 1, 8)) as bigint)"
    raise ValueError(f"unknown dialect {dialect!r}")


def md5_long(col: Column | str) -> Column:
    """Column twin of :func:`sql_md5_long` (spark dialect)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering key
# ---------------------------------------------------------------------------

ZBITS = 16


def zvalue16(x: Column | str, y: Column | str) -> Column:
    """32-bit Morton code interleaving the low 16 bits of two
    non-negative ints (x takes even bit positions, y odd).

    Multi-dimensional layout key for salted tables: writing a partition
    sorted by zvalue gives parquet row groups that are tight in BOTH
    dimensions, so 2-D range predicates prune row groups the way the
    reference's 1-D key-sorted buckets prune on the row key. Pure
    integer arithmetic — codegen'd, no UDF, identical in DuckDB.

    Negative inputs are folded with pmod (not %, which keeps the sign
    in both Spark and DuckDB and would interleave garbage bits)."""
    xc = F.pmod((F.col(x) if isinstance(x, str) else x).cast("bigint"), F.lit(1 << ZBITS))
    yc = F.pmod((F.col(y) if isinstance(y, str) else y).cast("bigint"), F.lit(1 << ZBITS))
    z = F.lit(0).cast("bigint")
    for i in range(ZBITS):
        z = z + F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def sql_zvalue16(x: str, y: str, dialect: str) -> str:
    m = 1 << ZBITS
    # ((v % m) + m) % m = pmod in both dialects (% preserves sign in each)
    xs = f"(((CAST({x} AS BIGINT) % {m}) + {m}) % {m})"
    ys = f"(((CAST({y} AS BIGINT) % {m}) + {m}) % {m})"
    terms = []
    for i in range(ZBITS):
        terms.append(f"((({xs} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ys} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
