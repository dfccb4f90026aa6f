"""Salt-aware range-scan planning (O7/O8).

Engine-native mode: because salt is its own column, the reference's
interval-pairing arithmetic (AbstractRowKeyDistributor.java:47-69)
dissolves into a plain predicate — ``key >= start AND key < stop`` is
pushed into every salt partition by Catalyst (static partition pruning
on ``salt`` + parquet min/max row-group pruning on ``key``). This module
provides that predicate builder, plus a byte-compat
``distributed_intervals`` that reproduces the reference's
``Pair<byte[],byte[]>[]`` plan for parity tests — with the latent
unsorted-prefix bug fixed structurally (both start and stop prefixes
are sorted; the reference sorts only starts, line 51, and pairs them
with enumeration-order stops, inverting intervals for unsorted
multi-byte hashers — SURVEY.md O7).

Start key is inclusive, stop key exclusive; ``None``/empty stop means
"to end of table" (HConstants.EMPTY_END_ROW semantics,
AbstractRowKeyDistributor.java:50-57).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, functions as F

from hbasewd_spark.plans.distributor import KeyDistributor


def range_predicate(key: Column | str, start: Any = None, stop: Any = None) -> Column:
    """``[start, stop)`` predicate on the key column; unbounded sides
    omitted (Scan(startKey, stopKey) semantics,
    RowKeyDistributorTestBase.java:96-115)."""
    c = F.col(key) if isinstance(key, str) else key
    pred = F.lit(True)
    if start is not None:
        pred = pred & (c >= F.lit(start))
    if stop is not None:
        pred = pred & (c < F.lit(stop))
    return pred


def distributed_intervals(
    distributor: KeyDistributor, start: bytes, stop: bytes | None
) -> list[tuple[bytes, bytes, bytes | None]]:
    """Byte-compat parity of ``getDistributedIntervals``
    (AbstractRowKeyDistributor.java:47-69): one ``(prefix,
    salted_start, salted_stop)`` per bucket.

    - bounded: ``prefix‖start .. prefix‖stop`` positionally (ref :58-61)
    - unbounded stop (``None``/empty): bucket *i*'s stop is bucket
      *i+1*'s start prefix; the last stop is open (ref :51-57) — i.e.
      half-open bucket intervals tiling the keyspace tail. The engine
      sorts the prefix table, so the pairing is correct for arbitrary
      (even unsorted multi-byte) prefix sets, unlike the reference.
    """
    prefixes = [_prefix_bytes(distributor, s) for s in distributor.all_salts()]
    prefixes.sort()
    out: list[tuple[bytes, bytes, bytes | None]] = []
    if stop is not None and len(stop) > 0:
        for p in prefixes:
            out.append((p, p + start, p + stop))
    else:
        starts = [p + start for p in prefixes]
        for i, p in enumerate(prefixes):
            nxt = prefixes[i + 1] if i + 1 < len(prefixes) else None
            out.append((p, starts[i], nxt))  # stop = next bucket's prefix
    return out


def _prefix_bytes(distributor: KeyDistributor, salt: int) -> bytes:
    n = distributor.prefix_length
    if n == 0:
        return b""
    if hasattr(distributor, "_sorted_prefixes"):
        return distributor._sorted_prefixes[salt]
    return salt.to_bytes(n, "big")
