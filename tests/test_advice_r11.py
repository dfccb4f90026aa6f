"""Round-11 regression locks for the ADVICE.md r10 findings.

1. ``_recover_expire_stage`` runs during EVERY verb's lock acquisition
   (compact/cluster/rebucket/upsert_rows), but its failure message
   hardcoded ``expire():`` — a recovery failure during compact() was
   misattributed to expire(). The acquiring verb is now threaded in.
2. ``_restore_aside`` returned ``preserved at {old}`` when the rename
   failed even if ``old`` was never created (the swap path where
   ``base`` did not exist skips the aside rename), pointing the
   operator at a nonexistent path. A missing aside copy now gets a
   distinct message.
"""

import json

import pytest
from pyspark.sql import functions as F

from hbasewd_spark.fsutil import Fs
from hbasewd_spark.plans.distributor import HashDistributor
from hbasewd_spark.sources.salted_table import (
    SaltedTable,
    _restore_aside,
    compact,
)


def _plant_crashed_stage(spark, t):
    """Fabricate the post-manifest crashed-expire state: a stage dir
    holding one staged survivor file plus the write-ahead manifest."""
    fs = Fs(spark, t.path)
    base = t.path.rstrip("/")
    stage = base + "/" + SaltedTable.EXPIRE_STAGE_DIR
    # copy one real data file into the stage under its salt partition
    src = next(
        p
        for p in fs.glob(base + "/salt=*/*")
        if not p.rsplit("/", 1)[1].startswith((".", "_"))
    )
    salt_dir = src.rsplit("/", 2)[1]
    fs.mkdirs(stage + "/" + salt_dir)
    fs.copy(src, stage + "/" + salt_dir + "/staged-survivor.parquet")
    fs.write_text(
        stage + "/" + SaltedTable.EXPIRE_MANIFEST,
        json.dumps({"delete": []}),
    )
    return fs, stage


def test_recovery_failure_names_the_acquiring_verb(
    spark, kv, tmp_path, monkeypatch
):
    """A staged-survivor rename failure during compact()'s lock
    acquisition must say so — not blame expire()."""
    t = SaltedTable.write(
        kv, str(tmp_path / "verbmsg"), HashDistributor(4), "key_long"
    )
    fs, stage = _plant_crashed_stage(spark, t)

    real = Fs.rename

    def failing(self, src, dst, _real=real):
        # glob returns file:-scheme paths; match on the stage dir name
        if SaltedTable.EXPIRE_STAGE_DIR in src:
            return False  # the staged-survivor merge rename fails
        return _real(self, src, dst)

    monkeypatch.setattr(Fs, "rename", failing)
    with pytest.raises(IOError, match=r"under compact\(\) lock"):
        compact(t)
    monkeypatch.undo()
    # the stage (and its survivor) must be preserved for the operator
    assert fs.exists(stage + "/" + SaltedTable.EXPIRE_MANIFEST)


def test_recovery_direct_call_defaults_to_expire(
    spark, kv, tmp_path, monkeypatch
):
    """Called without a verb (expire()'s own path), the message still
    attributes the failure to expire()."""
    t = SaltedTable.write(
        kv, str(tmp_path / "verbdflt"), HashDistributor(4), "key_long"
    )
    fs, stage = _plant_crashed_stage(spark, t)
    monkeypatch.setattr(
        Fs,
        "rename",
        lambda self, src, dst: SaltedTable.EXPIRE_STAGE_DIR not in src,
    )
    with pytest.raises(IOError, match=r"under expire\(\) lock"):
        t._recover_expire_stage(fs, stage)
    monkeypatch.undo()


def test_restore_aside_reports_missing_aside_copy(spark, kv, tmp_path):
    """When the aside copy was never created (base absent at swap
    time), the helper must say 'no aside copy exists' rather than
    'preserved at {old}' for a path that does not exist."""
    base = str(tmp_path / "noaside")
    t = SaltedTable.write(kv, base, HashDistributor(4), "key_long")
    fs = Fs(spark, base)
    old = base + ".old"
    assert not fs.exists(old)
    msg = _restore_aside(fs, old, base)
    assert msg.startswith("no aside copy exists"), msg
    assert old in msg  # still names the path so the operator can grep
    # and the live table is untouched
    assert SaltedTable.load(spark, base).df().count() == kv.count()
