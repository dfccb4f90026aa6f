"""Round-5 regression locks for the advisor findings (ADVICE.md r4):

1. ``df()`` must NOT mask a real load failure (corrupt footer,
   transient store error) as an empty table — the empty-relation
   fallback is legal only when the table genuinely has zero data
   files. Masking was a data-loss path: compact()/rebucket() read via
   df() and then replace the base dir.
2. The lifecycle swap (compact/rebucket) must leave a loadable table
   at a known path under EVERY failure mode — the old
   delete-then-rename protocol had a window with no table at base.
3. ``expire()`` must tolerate NULL keys: all-null zone bounds must not
   raise, and null-keyed rows (which have no age) must survive the
   boundary rewrite.
4. The dataset-manifest checksum must be overflow-closed (mod 2^32 on
   both engines) so Spark's wrap and DuckDB's HUGEINT sum agree at any
   row count.
"""

import json

import pytest
from pyspark.sql import functions as F, types as T

from hbasewd_spark.fsutil import Fs
from hbasewd_spark.plans.distributor import HashDistributor
from hbasewd_spark.sources.salted_table import SaltedTable, compact, rebucket


def test_df_reraises_on_corrupt_files_instead_of_empty_fallback(spark, kv, tmp_path):
    """A table whose data files are corrupt must raise on read, not
    silently present as empty — data_schema_json being present is not
    license to swallow arbitrary load failures."""
    t = SaltedTable.write(kv, str(tmp_path / "corrupt"), HashDistributor(4), "key_long")
    assert t.data_schema_json  # the fallback precondition is present
    fs = Fs(spark, t.path)
    for f in fs.glob(f"{t.path}/salt=*/*.parquet"):
        fs.write_text(f, "this is not a parquet file")
    t.refresh()
    with pytest.raises(Exception):
        # schema inference / footer read must surface the corruption
        t.df().count()


def test_df_empty_fallback_still_works_for_fileless_table(spark, kv, tmp_path):
    """The legitimate fallback: a table whose every data file is gone
    (full expiry) still loads as an empty relation with the persisted
    schema."""
    t = SaltedTable.write(kv, str(tmp_path / "gone"), HashDistributor(4), "key_long")
    fs = Fs(spark, t.path)
    for f in fs.glob(f"{t.path}/salt=*/*.parquet"):
        fs.delete(f)
    for d in fs.glob(f"{t.path}/salt=*"):
        fs.delete(d, recursive=True)
    t.refresh()
    assert t.df().count() == 0
    assert "key_long" in t.df().columns


def _fail_rename_matching(monkeypatch, substring):
    """Patch Fs.rename to return False when src contains substring."""
    real = Fs.rename

    def fake(self, src, dst):
        if substring in src:
            return False
        return real(self, src, dst)

    monkeypatch.setattr(Fs, "rename", fake)


def test_compact_swap_failure_restores_original(spark, kv, tmp_path, monkeypatch):
    """If the tmp->base rename fails mid-swap, the original table must
    be rolled back to base (loadable, full row count) — not left
    missing with the only copy in a *_tmp sibling."""
    path = str(tmp_path / "swapfail")
    t = SaltedTable.write(kv, path, HashDistributor(4), "key_long")
    n = t.df().count()
    _fail_rename_matching(monkeypatch, ".compact_tmp")
    with pytest.raises(IOError, match="swap rename"):
        compact(t)
    reloaded = SaltedTable.load(spark, path)
    assert reloaded.df().count() == n


def test_compact_aside_failure_changes_nothing(spark, kv, tmp_path, monkeypatch):
    """If even the move-aside (base -> base.old) fails, the live table
    must be untouched at base."""
    path = str(tmp_path / "asidefail")
    t = SaltedTable.write(kv, path, HashDistributor(4), "key_long")
    n = t.df().count()
    _fail_rename_matching(monkeypatch, "asidefail")  # fails base->old first
    with pytest.raises(IOError, match="move the live table aside"):
        compact(t)
    reloaded = SaltedTable.load(spark, path)
    assert reloaded.df().count() == n


def test_rebucket_swap_failure_restores_original(spark, kv, tmp_path, monkeypatch):
    path = str(tmp_path / "rbfail")
    t = SaltedTable.write(kv, path, HashDistributor(4), "key_long")
    n = t.df().count()
    _fail_rename_matching(monkeypatch, ".rebucket_tmp")
    with pytest.raises(IOError, match="swap rename"):
        rebucket(t, HashDistributor(8))
    reloaded = SaltedTable.load(spark, path)
    assert reloaded.df().count() == n
    assert reloaded.distributor.buckets == 4  # original strategy intact


def test_compact_and_rebucket_leave_no_old_dir_on_success(spark, kv, tmp_path):
    path = str(tmp_path / "clean")
    t = SaltedTable.write(kv, path, HashDistributor(4), "key_long")
    n = t.df().count()
    t = compact(t)
    t = rebucket(t, HashDistributor(8))
    fs = Fs(spark, path)
    assert not fs.exists(path + ".old")
    assert not fs.exists(path + ".compact_tmp")
    assert not fs.exists(path + ".rebucket_tmp")
    assert t.df().count() == n


NULLABLE_KV = T.StructType(
    [
        T.StructField("key_long", T.LongType(), True),
        T.StructField("val", T.IntegerType(), False),
    ]
)


def test_expire_preserves_null_keys_and_all_null_files(spark, tmp_path):
    """NULL keys have no age: expire() must neither raise on all-null
    zone bounds nor drop null-keyed rows from boundary rewrites."""
    rows = [(i * 100, i) for i in range(50)] + [(None, 1000 + j) for j in range(7)]
    df = spark.createDataFrame(rows, NULLABLE_KV)
    t = SaltedTable.write(df, str(tmp_path / "nullexp"), HashDistributor(4), "key_long")

    stats = t.expire(before=2500)  # drops key_long in [0, 2500)

    survivors = t.df()
    assert survivors.where(F.col("key_long").isNull()).count() == 7
    assert survivors.where(F.col("key_long") < 2500).count() == 0
    kept_nonnull = survivors.where(F.col("key_long").isNotNull()).count()
    assert kept_nonnull == sum(1 for k, _ in rows if k is not None and k >= 2500)
    assert stats["rows_dropped"] == sum(
        1 for k, _ in rows if k is not None and k < 2500
    )
    # re-run: idempotent, nulls still intact
    t.expire(before=2500)
    assert t.df().where(F.col("key_long").isNull()).count() == 7


def test_expire_keeps_files_whose_keys_are_all_null(spark, tmp_path):
    """A file with (None, None) zone bounds is kept outright — no
    TypeError comparing None to the cutoff."""
    # write an all-null-key table, then expire far in the future
    rows = [(None, j) for j in range(20)]
    df = spark.createDataFrame(rows, NULLABLE_KV)
    t = SaltedTable.write(df, str(tmp_path / "allnull"), HashDistributor(2), "key_long")
    stats = t.expire(before=10**12)
    assert stats["rows_dropped"] == 0
    assert t.df().count() == 20


def test_manifest_checksum_is_mod_2_32_closed(spark, sf_dir):
    """The per-table key checksum must lie in [0, 2^32) and equal the
    true modular sum — the overflow-closure contract that keeps Spark
    (wraps mod 2^64) and DuckDB (HUGEINT) in agreement at any scale."""
    from hbasewd_spark.functions.codec import md5_long
    from hbasewd_spark.queries import REGISTRY

    out = REGISTRY["ext_dataset_manifest"].fn(spark, sf_dir).collect()
    assert all(0 <= r.key_checksum < 2**32 for r in out)
    # independent recomputation for one table, summed exactly in Python
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    hs = [r.h for r in nat.select(md5_long("n_nationkey").alias("h")).collect()]
    want = sum(hs) % 2**32
    got = next(r.key_checksum for r in out if r.table_name == "nation")
    assert got == want
