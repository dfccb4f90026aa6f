"""Key-distribution strategies (the HBaseWD distributor SPI, Spark-first).

The reference's contract is ``AbstractRowKeyDistributor`` — transform a
row key into a salted key, enumerate all possible salted variants, strip
the salt back off (``/root/reference/src/main/java/com/sematext/hbase/wd/
AbstractRowKeyDistributor.java:32-37``). Here the salt is a **column**
(`IntegerType`, 0..buckets-1), not a byte prefix, so:

- ``getDistributedKey``  -> ``df.withColumn("salt", d.salt_expr(key))``
- ``getOriginalKey``     -> ``df.drop("salt")``
- ``getAllDistributedKeys`` -> ``d.all_salts()`` (plain list; in
  predicates simply ``salt IN (...)``)

and every strategy is a Catalyst column expression, so salting
participates in whole-stage codegen and partition pruning. Byte-level
fidelity (prefix bytes physically prepended) lives in
``functions/codec.py`` and :meth:`KeyDistributor.prefix_expr`.

Strategies mirror the reference's concrete classes plus its test-only
hashers:

- :class:`RoundRobinDistributor`  <- RowKeyDistributorByOneBytePrefix
- :class:`Hash31Distributor`      <- RowKeyDistributorByHashPrefix +
  OneByteSimpleHash (bit-compatible 31-polynomial hash)
- :class:`HashDistributor`        <- engine-native variant (xxhash64,
  better dispersion; the strategy the docs recommend at 100 TB)
- :class:`IdentityDistributor`    <- IdentityHash (0-byte prefix)
- :class:`MultiBytePrefixDistributor` <- the test-only
  MultiBytesPrefixHash (2-byte prefixes keyed on last byte mod 3)

Config round-tripping (``Parametrizable``/``addInfo``,
AbstractRowKeyDistributor.java:83-89) becomes a name+params dict
persisted with the table (see sources/salted_table.py) and rehydrated
via :func:`distributor_from_meta` — self-describing data, no
reflection.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

from pyspark.sql import Column, Window, functions as F

from hbasewd_spark.functions import codec


class KeyDistributor(ABC):
    """Pluggable distribution strategy (O12).

    Produces Column expressions so every strategy stays inside
    Catalyst/codegen. ``deterministic`` distinguishes hash-style salts
    (salted key recomputable from the key alone -> point gets prune to
    one bucket, README:75-78) from round-robin (point gets must fan out
    over all buckets, RowKeyDistributorByOneBytePrefix.java:60-72).
    """

    name: str = "abstract"

    def __init__(self, buckets: int):
        if not 1 <= buckets <= 32768:
            # reference validates 1..256 for one-byte prefixes
            # (RowKeyDistributorByHashPrefix.java:57-63); the engine's
            # salt is an int column so the cap is only a sanity bound.
            raise ValueError(f"maxBuckets should be in 1..32768 range, got {buckets}")
        self.buckets = buckets

    @abstractmethod
    def salt_expr(self, key: Column | str) -> Column:
        """IntegerType salt in [0, buckets) for each row."""

    @property
    def deterministic(self) -> bool:
        """True if salt is a pure function of the key."""
        return True

    def all_salts(self) -> list[int]:
        """getAllPossiblePrefixes (O6) — the full salt domain."""
        return list(range(self.buckets))

    # -- byte-compat layer (optional physical prefix) -------------------
    @property
    def prefix_length(self) -> int:
        """Bytes of physical prefix in byte-compat mode."""
        return 1 if self.buckets > 1 else 0

    def prefix_expr(self, salt: Column | str) -> Column:
        """BinaryType physical prefix for a salt value (byte-compat)."""
        s = F.col(salt) if isinstance(salt, str) else salt
        return F.unhex(F.lpad(F.hex(s.cast("bigint")), 2 * max(self.prefix_length, 1), "0"))

    # -- config round-trip (O11) ----------------------------------------
    def params(self) -> dict[str, Any]:
        return {"buckets": self.buckets}

    def to_meta(self) -> dict[str, Any]:
        return {"strategy": self.name, "params": self.params()}


class RoundRobinDistributor(KeyDistributor):
    """Key-independent round-robin salting (O1).

    Reference: ``RowKeyDistributorByOneBytePrefix`` keeps a mutable
    per-writer counter (``nextPrefix++ % maxPrefix``, lines 47-53) — a
    sequential construct with no exact distributed analogue (and no
    cross-writer guarantee in the reference either: two clients salt
    independently). Engine semantics, both key-independent and
    even-by-construction:

    - default (scalable): ``pmod(monotonically_increasing_id(), N)`` —
      each task salts its rows round-robin exactly like one reference
      writer; no shuffle, no state.
    - ``order_col`` given (deterministic/testable): round-robin in that
      write order via ``row_number() over (order by order_col)`` —
      reproduces the reference's single-writer test fixture exactly
      (RowKeyDistributorTestBase.java:138-150) at the cost of a global
      window; use only for parity tests, never at 100 TB.
    """

    name = "roundrobin"

    def __init__(self, buckets: int = 32, order_col: str | None = None):
        super().__init__(buckets)
        self.order_col = order_col

    def salt_expr(self, key: Column | str) -> Column:
        if self.order_col is not None:
            w = Window.orderBy(self.order_col)
            return F.pmod(F.row_number().over(w) - 1, F.lit(self.buckets)).cast("int")
        return F.pmod(F.monotonically_increasing_id(), F.lit(self.buckets)).cast("int")

    @property
    def deterministic(self) -> bool:
        return False  # salt not derivable from key -> point gets fan out (O4)

    def params(self) -> dict[str, Any]:
        return {"buckets": self.buckets, "order_col": self.order_col}


class HashDistributor(KeyDistributor):
    """Engine-native hash salting (O2) — ``pmod(xxhash64(key), N)``.

    Deterministic, uniform, JVM-codegen'd; the recommended strategy at
    scale. Replaces the reference's 31-polynomial
    (RowKeyDistributorByHashPrefix.java:111-114) with a modern 64-bit
    hash and fixes the ``Math.abs(Integer.MIN_VALUE)`` bug via pmod
    (SURVEY.md O5).
    """

    name = "hash"

    def salt_expr(self, key: Column | str) -> Column:
        c = F.col(key) if isinstance(key, str) else key
        return F.pmod(F.xxhash64(c), F.lit(self.buckets)).cast("int")


class Hash31Distributor(KeyDistributor):
    """Byte-compatible 31-polynomial hash salting (O2+O5).

    Bit-identical to ``RowKeyDistributorByHashPrefix(new
    OneByteSimpleHash(n))``: hashes the 8 big-endian bytes of a long
    key (or the raw bytes of a binary key) with ``h=31*h+b`` int32
    arithmetic. ``abs_bug=True`` reproduces ``Math.abs % mod`` incl.
    the Integer.MIN_VALUE negative bucket; default uses pmod.
    """

    name = "hash31"

    def __init__(self, buckets: int = 32, abs_bug: bool = False):
        super().__init__(buckets)
        self.abs_bug = abs_bug

    def salt_expr(self, key: Column | str) -> Column:
        c = F.col(key) if isinstance(key, str) else key
        return codec.hash31_bucket(c, self.buckets, abs_bug=self.abs_bug)

    def salt_expr_long(self, key: Column | str) -> Column:
        """Salt for a BIGINT key == salt of its 8 BE bytes."""
        c = F.col(key) if isinstance(key, str) else key
        return codec.hash31_bucket(codec.encode_long_be(c), self.buckets, abs_bug=self.abs_bug)

    def params(self) -> dict[str, Any]:
        return {"buckets": self.buckets, "abs_bug": self.abs_bug}


class IdentityDistributor(KeyDistributor):
    """No-op distribution (0-byte prefix, single bucket) — the
    degenerate case of RowKeyDistributorByHashPrefix with IdentityHash
    (_IdentityHashTest.java:9-36)."""

    name = "identity"

    def __init__(self, buckets: int = 1):
        super().__init__(1)

    def salt_expr(self, key: Column | str) -> Column:
        return F.lit(0).cast("int")

    @property
    def prefix_length(self) -> int:
        return 0


class MultiBytePrefixDistributor(KeyDistributor):
    """Multi-byte-prefix hashing over the key's last byte — mirrors the
    test-only ``MultiBytesPrefixHash`` (_MultiBytesPrefixHashTest.java:
    8-39): prefixes {0x03,0x17},{0x01,0x37},{0x02,0x37} selected by
    ``abs(lastByte % 3)`` (Java % keeps sign; abs folds it).

    Structural fix for the O7 latent invariant: the engine always
    *sorts* the prefix table (AbstractRowKeyDistributor.java:47-69
    pairs sorted starts with enumeration-order stops, which inverts
    intervals when prefixes are enumerated unsorted — SURVEY.md O7).
    The salt column is the index into the sorted table, so interval
    logic can't desynchronize by construction.
    """

    name = "multibyte"

    DEFAULT_PREFIXES = (b"\x03\x17", b"\x01\x37", b"\x02\x37")

    def __init__(self, buckets: int = 3, prefixes: tuple[bytes, ...] | None = None):
        prefixes = tuple(prefixes or self.DEFAULT_PREFIXES)
        super().__init__(len(prefixes))
        if len({len(p) for p in prefixes}) != 1:
            raise ValueError("all prefixes must have equal length")
        self._sorted_prefixes = tuple(sorted(prefixes))  # structural O7 fix
        self._enum_index_to_sorted = {
            i: self._sorted_prefixes.index(p) for i, p in enumerate(prefixes)
        }

    def salt_expr(self, key: Column | str) -> Column:
        c = F.col(key) if isinstance(key, str) else key
        # last byte of the binary key, as signed Java byte
        last = F.conv(F.hex(F.substring(c, -1, 1)), 16, 10).cast("bigint")
        signed = F.when(last > 127, last - 256).otherwise(last)
        # Java: Math.abs(signed % 3)  (Java % keeps dividend sign)
        jmod = signed - (signed / self.buckets).cast("bigint") * self.buckets
        enum_idx = F.abs(jmod).cast("int")
        # map enumeration index -> index in the *sorted* prefix table
        mapping = F.map_from_arrays(
            F.array(*[F.lit(k) for k in self._enum_index_to_sorted]),
            F.array(*[F.lit(v) for v in self._enum_index_to_sorted.values()]),
        )
        return mapping[enum_idx].cast("int")

    @property
    def prefix_length(self) -> int:
        return len(self._sorted_prefixes[0])

    def prefix_expr(self, salt: Column | str) -> Column:
        s = F.col(salt) if isinstance(salt, str) else salt
        hexes = F.array(*[F.lit(p.hex().upper()) for p in self._sorted_prefixes])
        return F.unhex(hexes[s])

    def params(self) -> dict[str, Any]:
        return {"prefixes": [p.hex() for p in self._sorted_prefixes]}


# ---------------------------------------------------------------------------
# Registry (O11: config round-trip without reflection)
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, type[KeyDistributor]] = {
    d.name: d
    for d in (
        RoundRobinDistributor,
        HashDistributor,
        Hash31Distributor,
        IdentityDistributor,
        MultiBytePrefixDistributor,
    )
}


def register_distributor(cls: type[KeyDistributor]) -> None:
    _REGISTRY[cls.name] = cls


PARAM_DELIM = "--"  # the reference's nested-param delimiter


def to_param_string(d: KeyDistributor) -> str:
    """String round-trip in the reference's ``Parametrizable`` wire
    shape: ``name--k=v--k=v`` (the reference nests
    ``params--hasherClassName`` with the same ``--`` delimiter,
    RowKeyDistributorByHashPrefix.java:28,137-152; here the 'class
    name' is the registry name, no reflection)."""
    parts = [d.name] + [f"{k}={v}" for k, v in sorted(d.params().items())]
    return PARAM_DELIM.join(parts)


def from_param_string(s: str) -> KeyDistributor:
    name, *kvs = s.split(PARAM_DELIM)
    params: dict[str, Any] = {}
    for kv in kvs:
        k, _, v = kv.partition("=")
        if v == "None":
            params[k] = None
        elif v in ("True", "False"):
            params[k] = v == "True"
        elif v.lstrip("-").isdigit():
            params[k] = int(v)
        elif v.startswith("["):  # hex prefix list
            params[k] = [p.strip(" '\"") for p in v.strip("[]").split(",")]
        else:
            params[k] = v
    return distributor_from_meta({"strategy": name, "params": params})


def distributor_from_meta(meta: dict[str, Any]) -> KeyDistributor:
    """Rehydrate a distributor from persisted table metadata — the
    engine's ``WdTableInputFormat.setConf`` (WdTableInputFormat.java:
    41-56) without reflection."""
    cls = _REGISTRY[meta["strategy"]]
    params = dict(meta.get("params", {}))
    if cls is MultiBytePrefixDistributor and "prefixes" in params:
        params["prefixes"] = tuple(bytes.fromhex(p) for p in params["prefixes"])
        params.pop("buckets", None)
    return cls(**params)
