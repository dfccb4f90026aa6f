"""Source/sink formats beyond parquet (P1 generalized).

The reference's only storage is HBase (P1). The engine's canonical
store is salt-partitioned parquet (sources/salted_table.py); this
module adds the interchange formats a pipeline needs — CSV, JSON
lines, ORC — with explicit schemas (no runtime inference in the load
path: at 100 TB schema inference is a full extra scan), plus the seam
where an HBase connector sink would plug in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T


def write_table(df: DataFrame, path: str, fmt: str, mode: str = "overwrite", **options) -> None:
    w = df.write.mode(mode)
    if fmt == "csv":
        w = w.option("header", True)
    w.format(fmt).options(**options).save(path)


def read_table(spark: SparkSession, path: str, fmt: str, schema: T.StructType, **options) -> DataFrame:
    r = spark.read.schema(schema)
    if fmt == "csv":
        r = r.option("header", True)
    return r.format(fmt).options(**options).load(path)


class HBaseSink:
    """Seam for the literal 'DataFrame writes to HBase' goal
    (BASELINE.json spark_approach). The Spark-HBase connector
    (`org.apache.hadoop.hbase.spark` / `shc`) is a JVM package not
    present in this container; this class carries the engine-side
    contract — salted key construction + column-family mapping — and
    fails loudly at `.save()` when the connector is absent.

    The salted write itself (the part HBaseWD owns) happens BEFORE the
    connector boundary: `to_puts` emits `(rowkey: binary, cf:qual
    values)` rows with the physical `prefix ‖ key` rowkey, so any
    HBase writer (connector, bulk-load HFiles via MR, foreachPartition
    puts) distributes across regions exactly like the reference.
    """

    def __init__(self, table: str, cf: str = "colfam"):
        self.table = table
        self.cf = cf

    def to_puts(self, df: DataFrame, distributor, key_col: str) -> DataFrame:
        from pyspark.sql import functions as F

        from hbasewd_spark.functions import codec

        # The reference salts the PHYSICAL key bytes
        # (hasher.getHashPrefix(originalKey),
        # RowKeyDistributorByHashPrefix.java:113), so the salt must be
        # computed on the same BE-encoded bytes that form the rowkey —
        # salting the logical long instead would be engine-consistent
        # but not byte-compatible with a Java reader of the same table.
        key_bin = (
            F.col(key_col)
            if dict(df.dtypes).get(key_col) == "binary"
            else codec.encode_long_be(F.col(key_col).cast("bigint"))
        )
        out = df.withColumn("_rk_key_bin", key_bin)
        salt = distributor.salt_expr(F.col("_rk_key_bin"))
        rowkey = codec.concat_salted_key(
            distributor.prefix_expr(salt), F.col("_rk_key_bin")
        )
        return out.withColumn("rowkey", rowkey).drop("_rk_key_bin")

    def save(self, puts_df: DataFrame, writer=None) -> None:
        """Hand the puts relation to the connector.

        ``writer`` is the connector adapter seam: any callable taking
        the puts DataFrame (the real hbase-spark bulk put, an
        HFile-bulk-load job, or a test double) — everything HBaseWD
        owns (salting, rowkey bytes) already happened in
        :meth:`to_puts`, so the adapter only moves bytes. With no
        writer, the real connector is required on the classpath and
        its absence fails loudly (never a silent no-op)."""
        if writer is not None:
            writer(puts_df)
            return
        jvm_has_connector = False
        try:  # pragma: no cover - container has no connector jar
            spark = puts_df.sparkSession
            # py4j resolves missing classes lazily as packages ->
            # Class.forName is the reliable presence check
            spark._jvm.java.lang.Class.forName("org.apache.hadoop.hbase.spark.HBaseContext")
            jvm_has_connector = True
        except Exception:
            pass
        if not jvm_has_connector:
            raise NotImplementedError(
                "HBase connector jar not on the classpath; add "
                "hbase-spark (or shc) and this sink writes `rowkey` rows "
                f"to table {self.table!r} cf {self.cf!r}. The salted-rowkey "
                "DataFrame from to_puts() is connector-agnostic."
            )
