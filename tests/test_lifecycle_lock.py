"""Lifecycle concurrency (VERDICT r5 next-round #7).

Two pins:
1. the lock sentinel — since ADVICE r8 a SIBLING ``<base>.wd_lock``
   file, never inside the swapped dir: two lifecycle verbs (expire /
   compact / rebucket / upsert_rows) cannot interleave silently — the
   second acquirer fails loudly, and the lock is released on both
   success and in-verb failure;
2. the documented reader anomaly: a reader whose file listing predates
   an ``expire()`` stage-swap MISSES surviving rows — the "run in the
   ingest-quiescent window" contract was prose-only; this makes it a
   failing-if-fixed observation so the docs can never silently drift
   from behavior.
"""

import pytest
from pyspark.sql import functions as F

from hbasewd_spark.fsutil import Fs
from hbasewd_spark.plans.distributor import HashDistributor
from hbasewd_spark.sources.salted_table import SaltedTable, compact


def _table(spark, path, n=400, buckets=4):
    df = spark.range(n).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    return SaltedTable.write(df, path, HashDistributor(buckets), "k")


def _lock_path(t):
    return SaltedTable.lock_path(t.path)


def test_second_lifecycle_verb_fails_loudly_while_locked(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t1"))
    fs = Fs(spark, t.path)
    assert fs.create_atomic(_lock_path(t), '{"verb": "expire", "pid": 1}')
    with pytest.raises(RuntimeError, match="another lifecycle operation"):
        t.expire(before=100)
    with pytest.raises(RuntimeError, match="another lifecycle operation"):
        compact(t)
    with pytest.raises(RuntimeError, match="another lifecycle operation"):
        t.upsert_rows(
            spark.createDataFrame([(1, "x")], "k long, v string")
        )
    # table data was never touched while refused
    assert t.scan().count() == 400
    fs.delete(_lock_path(t))
    stats = t.expire(before=100)  # released lock -> verb proceeds
    assert stats["rows_dropped"] == 100
    assert not fs.exists(_lock_path(t))  # released after success


def test_lock_released_after_in_verb_failure(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t2"))
    fs = Fs(spark, t.path)
    # schema-mismatched changes blow up INSIDE the locked upsert body
    with pytest.raises(Exception, match="wrong_col|UNRESOLVED|cannot resolve"):
        t.upsert_rows(
            spark.createDataFrame([(1, "x")], "k long, wrong_col string")
        )
    assert not fs.exists(_lock_path(t))  # finally released it
    compact(t)  # and the next verb acquires cleanly
    assert t.scan().count() == 400


def test_create_atomic_is_create_if_absent(spark, tmp_path):
    fs = Fs(spark, str(tmp_path))
    p = str(tmp_path / "sentinel")
    assert fs.create_atomic(p, "a") is True
    assert fs.create_atomic(p, "b") is False
    assert fs.read_text(p) == "a"  # loser never overwrites


def test_create_atomic_propagates_non_exists_failures(spark, tmp_path):
    """ADVICE r6: only the lost-the-race outcome maps to False. A
    create that fails for any other reason (here: the parent path is a
    FILE, so no child can be created) must raise, not masquerade as
    'another lifecycle operation holds the lock'."""
    fs = Fs(spark, str(tmp_path))
    blocker = str(tmp_path / "blocker")
    fs.write_text(blocker, "i am a file")
    with pytest.raises(Exception):
        fs.create_atomic(blocker + "/child", "x")


def test_lock_survives_staged_rewrite_swap(spark, tmp_path):
    """ADVICE r6/r8: the lock must remain HELD across compact()'s
    aside-rename swap (the in-dir sentinel used to ride away with
    base.old, releasing it mid-verb; the sibling sentinel is untouched
    by the swap's renames). Pin: at rebuild_zone_maps time
    (post-swap), the lock sentinel must still exist and a second verb
    must still refuse; after the verb returns the lock is gone."""
    t = _table(spark, str(tmp_path / "t_swap"))
    t.rebuild_zone_maps()
    fs = Fs(spark, t.path)
    observed = {}
    real_rebuild = SaltedTable.rebuild_zone_maps

    def spy(self):
        observed["lock_exists_at_rebuild"] = fs.exists(_lock_path(self))
        try:
            self.expire(before=1)
            observed["second_verb_refused"] = False
        except RuntimeError as e:
            observed["second_verb_refused"] = "another lifecycle" in str(e)
        return real_rebuild(self)

    import unittest.mock as mock

    with mock.patch.object(SaltedTable, "rebuild_zone_maps", spy):
        compact(t)
    assert observed["lock_exists_at_rebuild"] is True
    assert observed["second_verb_refused"] is True
    assert not fs.exists(_lock_path(t))  # released at true verb end
    assert t.scan().count() == 400


def test_lock_survives_rebucket_swap(spark, tmp_path):
    """Same pin for rebucket(): the carried sentinel rides the swap
    and is released only when the verb returns."""
    from hbasewd_spark.sources.salted_table import rebucket

    t = _table(spark, str(tmp_path / "t_rb"))
    fs = Fs(spark, t.path)
    t2 = rebucket(t, HashDistributor(8))
    assert not fs.exists(_lock_path(t2))
    assert t2.scan().count() == 400
    assert t2.distributor.buckets == 8


def test_reader_interleaved_with_expire_misses_surviving_rows(spark, tmp_path):
    """The documented expire() anomaly, pinned: a reader whose file
    listing predates the stage-swap silently misses surviving rows
    (with ignoreMissingFiles=true; with the default false it crashes
    on the deleted originals instead). If a future snapshot mechanism
    fixes this, this test SHOULD fail and the docs change with it."""
    t = _table(spark, str(tmp_path / "t3"))
    stale_reader = t.scan()  # file listing captured at plan time
    prev = spark.conf.get("spark.sql.files.ignoreMissingFiles", "false")
    spark.conf.set("spark.sql.files.ignoreMissingFiles", "true")
    try:
        stats = t.expire(before=200)
        assert stats["rows_dropped"] == 200
        post = t.scan().count()
        assert post == 200  # fresh reader sees exactly the survivors
        stale = stale_reader.count()
        # every boundary file was rewritten under a NEW name, so the
        # stale listing finds only wholly-kept files: survivors from
        # rewritten files are MISSING from the stale read
        assert stale < post, (
            "stale reader saw all survivors — expire() became "
            "reader-atomic; update the documented contract"
        )
    finally:
        spark.conf.set("spark.sql.files.ignoreMissingFiles", prev)


def test_epoch_commit_respects_and_holds_the_lifecycle_lock(spark, tmp_path):
    """VERDICT r6 #7: the streaming sink's epoch COMMIT phase now
    rides the same _wd_lock as the lifecycle verbs. Pin the contract
    three ways: (1) a held lock makes the epoch commit wait and then
    raise past its timeout, with the staging dir preserved for the
    replay; (2) after release the replay of the SAME epoch succeeds
    exactly-once; (3) during the commit's rename phase the lock
    exists on the table, so a concurrent verb would refuse."""
    import unittest.mock as mock

    from hbasewd_spark.fsutil import Fs as RealFs
    from hbasewd_spark.streaming.ingest import idempotent_salted_batch_write

    t = _table(spark, str(tmp_path / "t_stream"), n=100)
    fs = Fs(spark, t.path)
    batch = spark.createDataFrame(
        [(1000 + i, f"s{i}") for i in range(20)], "k long, v string"
    )

    # (1) held lock -> bounded wait -> loud raise, stage preserved
    assert fs.create_atomic(_lock_path(t), '{"verb": "compact", "pid": 1}')
    with pytest.raises(RuntimeError, match="lifecycle lock still held"):
        idempotent_salted_batch_write(
            batch, 7, t.path, t.distributor, "k", lock_timeout_s=0.6
        )
    stage = t.path.rstrip("/") + "/.staging-epoch-7"
    assert fs.is_dir(stage)  # this epoch's data survives for the replay
    assert t.scan().count() == 100  # nothing committed under the race

    # (2) release -> replay of the same epoch commits exactly-once
    fs.delete(_lock_path(t))
    idempotent_salted_batch_write(
        batch, 7, t.path, t.distributor, "k", lock_timeout_s=5
    )
    t.refresh()
    assert t.scan().count() == 120
    assert not fs.exists(_lock_path(t))  # released after the commit

    # (3) the rename phase holds the lock (a racing verb would refuse)
    seen = {}
    real_rename = RealFs.rename

    def spy(self, src, dst):
        if "epoch-" in dst and "lock_during_rename" not in seen:
            seen["lock_during_rename"] = fs.exists(_lock_path(t))
        return real_rename(self, src, dst)

    with mock.patch.object(RealFs, "rename", spy):
        idempotent_salted_batch_write(
            batch, 8, t.path, t.distributor, "k", lock_timeout_s=5
        )
    assert seen["lock_during_rename"] is True
    t.refresh()
    assert t.scan().count() == 140


def test_epoch_commit_unlocked_on_bare_sink_dir(spark, tmp_path):
    """A dest without table metadata (bare salt-dir sink) has nothing
    a lifecycle verb could target: the epoch write runs unlocked and
    leaves no sentinel behind."""
    from hbasewd_spark.streaming.ingest import idempotent_salted_batch_write

    dest = str(tmp_path / "bare_sink")
    batch = spark.createDataFrame(
        [(i, f"s{i}") for i in range(10)], "k long, v string"
    )
    idempotent_salted_batch_write(batch, 1, dest, HashDistributor(4), "k")
    fs = Fs(spark, dest)
    assert not fs.exists(SaltedTable.lock_path(dest))
    assert spark.read.parquet(dest).count() == 10


def test_lock_acquisition_cannot_resurrect_mid_swap_base(spark, tmp_path):
    """ADVICE r8 (the race this round's redesign closes): with the
    table MID-SWAP (base renamed aside, staged replacement not yet in
    place), acquiring/polling the commit lock must not recreate
    ``base`` — the in-dir sentinel's create could do exactly that,
    making the verb's rename land the staged table INSIDE the
    resurrected dir. With the sibling sentinel, an epoch commit
    arriving mid-swap just waits; once the verb completes and
    releases, the waiting commit acquires cleanly."""
    import threading
    import time

    from hbasewd_spark.streaming.ingest import _epoch_commit_lock

    t = _table(spark, str(tmp_path / "t_midswap"), n=100)
    fs = Fs(spark, t.path)
    base = t.path.rstrip("/")
    # simulate a verb mid-swap HOLDING the sibling lock: base is aside,
    # replacement not yet renamed in
    assert fs.create_atomic(_lock_path(t), '{"verb": "compact", "pid": 1}')
    assert fs.rename(base, base + ".old")
    assert not fs.exists(base)

    state = {}

    def epoch_commit():
        try:
            with _epoch_commit_lock(fs, t.path, 4, timeout_s=8, poll_s=0.05):
                state["acquired_with_base_present"] = fs.exists(base)
        except Exception as e:  # pragma: no cover - surfaced below
            state["err"] = e

    th = threading.Thread(target=epoch_commit)
    th.start()
    time.sleep(1.0)  # the commit is inside its poll loop now
    # THE pin: polling on the lock never recreated base
    assert not fs.exists(base), "lock acquisition resurrected the base dir"
    # verb completes its swap and releases; the waiting commit acquires
    assert fs.rename(base + ".old", base)
    fs.delete(_lock_path(t))
    th.join(timeout=30)
    assert not th.is_alive() and "err" not in state, state.get("err")
    assert state.get("acquired_with_base_present") is True
    assert not fs.exists(_lock_path(t))  # released on exit
    t.refresh()
    assert t.scan().count() == 100  # table intact at base, not nested


def test_swap_clears_base_resurrected_by_racing_stage_write(spark, tmp_path):
    """The dual hazard: a streaming epoch's STAGE write (outside the
    lock by design) recreates ``base`` while a verb is mid-swap. The
    verb's rename onto the existing dir would nest the staged table
    one level deep. Pin the defense: the swap deletes the resurrected
    (staging-only) dir — forcing the epoch's manifest-replay — and the
    compacted table lands AT base, not inside it."""
    import unittest.mock as mock

    t = _table(spark, str(tmp_path / "t_stager"), n=400)
    fs = Fs(spark, t.path)
    base = t.path.rstrip("/")
    real_rename = Fs.rename
    state = {"injected": False}

    def inject(self, src, dst):
        r = real_rename(self, src, dst)
        if dst.endswith(".old") and not state["injected"]:
            state["injected"] = True
            # the racing stager lands its stage inside a fresh base
            fs.mkdirs(base + "/.staging-epoch-9/salt=0")
            fs.write_text(
                base + "/.staging-epoch-9/salt=0/part-0.parquet", "x"
            )
        return r

    with mock.patch.object(Fs, "rename", inject):
        compact(t)
    assert state["injected"]
    t2 = SaltedTable.load(spark, base)
    assert t2.scan().count() == 400  # table AT base, nothing nested
    assert not fs.glob(base + "/*/.staging-epoch-*")  # no nesting
    assert not fs.glob(base + "/.staging-epoch-*")  # stage cleared -> replay
    assert not fs.exists(base + ".old")


def test_verb_destroying_stage_forces_epoch_replay(spark, tmp_path, monkeypatch):
    """ADVICE r7 (medium): the epoch staging dir lives inside the table
    dir and is written OUTSIDE the lock — a lifecycle verb that wins
    the lock between stage and commit swaps ``base -> base.old`` and
    deletes the aside copy, destroying the stage. The commit must then
    RAISE (so foreachBatch replays the epoch), never return success
    with zero files renamed. Simulated by running compact() at the top
    of the commit's lock acquisition — exactly the winning-verb
    interleaving."""
    import contextlib

    import hbasewd_spark.streaming.ingest as ing
    from hbasewd_spark.streaming.ingest import idempotent_salted_batch_write

    t = _table(spark, str(tmp_path / "t_race"), n=100)
    fs = Fs(spark, t.path)
    batch = spark.createDataFrame(
        [(2000 + i, f"r{i}") for i in range(15)], "k long, v string"
    )

    real_lock = ing._epoch_commit_lock

    @contextlib.contextmanager
    def racing_lock(lfs, dest_path, epoch_id, timeout_s, poll_s=0.2):
        compact(t)  # the verb wins the race window; stage dies with base.old
        with real_lock(lfs, dest_path, epoch_id, timeout_s, poll_s):
            yield

    monkeypatch.setattr(ing, "_epoch_commit_lock", racing_lock)
    with pytest.raises(RuntimeError, match="swapped the table dir"):
        idempotent_salted_batch_write(batch, 3, t.path, t.distributor, "k")
    # nothing committed, nothing lost, lock released
    t.refresh()
    assert t.scan().count() == 100
    assert not fs.exists(_lock_path(t))

    # the replay (same epoch id, no race) commits exactly-once
    monkeypatch.setattr(ing, "_epoch_commit_lock", real_lock)
    idempotent_salted_batch_write(batch, 3, t.path, t.distributor, "k")
    t.refresh()
    assert t.scan().count() == 115
    assert t.scan().where("k >= 2000").count() == 15
    assert not fs.glob(t.path.rstrip("/") + "/.staging-epoch-*")


def test_epoch_commit_crash_mid_rename_replays_exactly_once(spark, tmp_path):
    """VERDICT r7 #7: fault-inject Fs.rename to die AFTER the stale
    purge and the first epoch-file rename — the mid-commit crash leg.
    The failed commit must leave the stage intact and the lock
    released; the epoch replay (foreachBatch redelivery) must converge
    to exactly-once: the partial renames of the crashed attempt are
    purged by the replay's own stale-purge, and no .staging dir leaks."""
    import unittest.mock as mock

    from hbasewd_spark.fsutil import Fs as RealFs
    from hbasewd_spark.streaming.ingest import idempotent_salted_batch_write

    t = _table(spark, str(tmp_path / "t_crash"), n=100)
    fs = Fs(spark, t.path)
    batch = spark.createDataFrame(
        [(3000 + i, f"c{i}") for i in range(40)], "k long, v string"
    )

    real_rename = RealFs.rename
    state = {"epoch_renames": 0}

    def crashing(self, src, dst):
        if "epoch-" in dst:
            state["epoch_renames"] += 1
            if state["epoch_renames"] == 2:
                raise IOError("injected crash mid-commit")
        return real_rename(self, src, dst)

    with mock.patch.object(RealFs, "rename", crashing):
        with pytest.raises(IOError, match="injected crash"):
            idempotent_salted_batch_write(
                batch, 9, t.path, t.distributor, "k"
            )
    assert state["epoch_renames"] == 2  # crashed exactly where injected
    stage = t.path.rstrip("/") + "/.staging-epoch-9"
    assert fs.is_dir(stage)  # preserved for the replay
    assert not fs.exists(_lock_path(t))  # lock released on the error path
    # one file DID land before the crash — the replay must purge it
    landed = fs.glob(t.path.rstrip("/") + "/salt=*/epoch-0000000009-*.parquet")
    assert len(landed) == 1

    # replay: same epoch id, no fault
    idempotent_salted_batch_write(batch, 9, t.path, t.distributor, "k")
    t.refresh()
    assert t.scan().count() == 140  # exactly-once: no dupes, no loss
    assert t.scan().where("k >= 3000").count() == 40
    assert not fs.glob(t.path.rstrip("/") + "/.staging-epoch-*")
    assert not fs.exists(_lock_path(t))
