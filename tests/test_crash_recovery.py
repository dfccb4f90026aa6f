"""Exhaustive crash-point injection for the lifecycle swap protocol.

The swap's documented invariant (``_swap_table_dirs`` docstring):
EVERY failure mode leaves a complete, loadable copy of the table at a
known path — ``base``, ``base.old``, ``base.hoist``, or the staged
``*_tmp`` sibling. The existing tests check hand-picked failure points
(aside-rename fails, swap-rename fails, hoist fails); this suite
checks ALL of them mechanically: it crashes the verb at the k-th
MUTATING filesystem operation for every k the verb performs, and after
each crash asserts that some location still holds every row.

This is the difference between "we thought about the failure modes we
thought of" and "the protocol is crash-safe at every step" — on a
real cluster the driver can die at any point between two namenode
RPCs.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hbasewd_spark.fsutil import Fs
from hbasewd_spark.plans.distributor import HashDistributor
from hbasewd_spark.sources.salted_table import SaltedTable, compact, rebucket

MUTATORS = ("rename", "delete", "copy", "create_atomic", "write_text", "mkdirs")


class _InjectedCrash(Exception):
    pass


class _CrashAfter:
    """Patch every mutating Fs op to raise on the n-th call."""

    def __init__(self, monkeypatch, crash_at):
        self.count = 0
        self.crash_at = crash_at  # 1-based; 0 disables
        self.ops = []
        for name in MUTATORS:
            real = getattr(Fs, name)

            def wrapper(fs_self, *a, _real=real, _name=name, **kw):
                self.count += 1
                self.ops.append((_name, a[0] if a else None))
                if self.crash_at and self.count == self.crash_at:
                    raise _InjectedCrash(f"crash at op {self.count}: {_name} {a}")
                return _real(fs_self, *a, **kw)

            monkeypatch.setattr(Fs, name, wrapper)


def _rows_at(spark, path):
    """Row count of whatever (possibly meta-less) table dir sits at
    ``path``, by reading the salt partition dirs directly — load()
    needs the metadata file, which some crash points legitimately
    leave only in the other location."""
    fs = Fs(spark, path)
    parts = fs.glob(f"{path.rstrip('/')}/salt=*")
    if not parts:
        return None
    try:
        return (
            spark.read.option("basePath", path).parquet(*parts).count()
        )
    except Exception:
        return None


def _assert_survivable(spark, base, n_expected, crash_op):
    """The invariant: at least one of the candidate locations holds
    every row."""
    candidates = [base, base + ".old", base + ".hoist",
                  base + ".compact_tmp", base + ".rebucket_tmp"]
    counts = {p: _rows_at(spark, p) for p in candidates}
    survivors = [p for p, n in counts.items() if n == n_expected]
    assert survivors, (
        f"crash at {crash_op}: NO complete copy anywhere — counts {counts}"
    )


def _fresh_table(spark, tmp_path, name):
    df = spark.range(300).select(
        F.col("id").alias("key_long"), (F.col("id") * 3).alias("v")
    )
    return SaltedTable.write(
        df, str(tmp_path / name), HashDistributor(4), "key_long"
    )


@pytest.mark.parametrize("verb_name", ["compact", "rebucket"])
def test_every_crash_point_leaves_a_complete_copy(
    spark, tmp_path, monkeypatch, verb_name
):
    # pass 1: count the verb's mutating ops without crashing
    t = _fresh_table(spark, tmp_path, f"{verb_name}_probe")
    probe = _CrashAfter(monkeypatch, crash_at=0)
    if verb_name == "compact":
        compact(t)
    else:
        rebucket(t, HashDistributor(8))
    total_ops = probe.count
    monkeypatch.undo()
    assert total_ops >= 4, f"expected a multi-step protocol, saw {probe.ops}"

    # pass 2: crash at every op index, verify survivability each time
    for k in range(1, total_ops + 1):
        t = _fresh_table(spark, tmp_path, f"{verb_name}_k{k}")
        base = t.path
        inj = _CrashAfter(monkeypatch, crash_at=k)
        try:
            if verb_name == "compact":
                compact(t)
            else:
                rebucket(t, HashDistributor(8))
            crashed = False
        except _InjectedCrash:
            crashed = True
        except IOError:
            # the protocol noticed a failed step and reported it —
            # fine, as long as the data survived (checked below)
            crashed = True
        finally:
            monkeypatch.undo()
        op = inj.ops[k - 1] if crashed and len(inj.ops) >= k else ("finished", None)
        _assert_survivable(spark, base, 300, f"{verb_name} op#{k} {op}")


def test_crash_then_recovery_path_is_loadable_or_documented(
    spark, tmp_path, monkeypatch
):
    """After any mid-swap crash, either load(base) works outright, or
    the documented manual recovery (rename base.old -> base) makes it
    work. No crash point may require forensic reconstruction."""
    t = _fresh_table(spark, tmp_path, "recovery_probe")
    probe = _CrashAfter(monkeypatch, crash_at=0)
    compact(t)
    total_ops = probe.count
    monkeypatch.undo()

    for k in range(1, total_ops + 1):
        t = _fresh_table(spark, tmp_path, f"recovery_k{k}")
        base = t.path
        inj = _CrashAfter(monkeypatch, crash_at=k)
        try:
            compact(t)
        except (_InjectedCrash, IOError):
            pass
        finally:
            monkeypatch.undo()
        fs = Fs(spark, base)
        loaded = None
        try:
            loaded = SaltedTable.load(spark, base).df().count()
        except Exception:
            pass
        if loaded != 300 and fs.exists(base + ".old"):
            # documented recovery: the aside copy is the table
            if fs.exists(base):
                fs.delete(base, recursive=True)
            assert fs.rename(base + ".old", base)
            loaded = SaltedTable.load(spark, base).df().count()
        assert loaded == 300, f"crash at op#{k}: unrecoverable ({inj.ops[k-1:k]})"
