"""Structured Streaming ingest & analytics (SURVEY §3.1 / §2.3).

The reference's write path is conceptually streaming ingest — a client
loop of ``hTable.put(saltedKey, ...)`` (README:43-47). The engine's
twin is a Structured Streaming pipeline: ``readStream →
withColumn(salt) → writeStream.foreachBatch(salted append)``. Salting
is stateless and per-row, so it composes with any source/sink and adds
no state store.

Also provided: event-time windowed aggregation with watermarking (late
data), and a custom stateful per-user counter via
``applyInPandasWithState`` — the streaming operators the reference
never had but a Spark-native engine exposes as first-class.

At 100 TB/day: the foreachBatch append writes one file per salt
partition per micro-batch; compaction is a downstream batch job over
the same salt layout (no reshuffle — salt stays the partition key).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from hbasewd_spark.fsutil import Fs as _Fs
from hbasewd_spark.plans.distributor import KeyDistributor
from hbasewd_spark.sources.salted_table import (
    META_FILE,
    SALT_COL,
    SaltedTable,
    salted,
)


import contextlib

# stage-integrity manifest, written into the staging dir after the
# epoch's files land and verified under the commit lock (ADVICE r7)
STAGE_MANIFEST = "_stage_manifest.json"


@contextlib.contextmanager
def _epoch_commit_lock(
    fs: _Fs, dest_path: str, epoch_id: int, timeout_s: float, poll_s: float = 0.2
):
    """Serialize an epoch's COMMIT phase (purge + renames) against the
    table lifecycle verbs (VERDICT r6 #7): a ``compact()`` racing a
    live micro-batch commit was the one remaining unserialized writer
    pair — the verb's swap could strand this epoch's just-renamed files
    in ``base.old`` or stamp a sidecar watermark over them mid-flight.

    Contract: the expensive staging WRITE happens outside the lock;
    only the cheap rename phase holds it (milliseconds), so a verb
    waiting on the sink sees a short critical section. The commit
    WAITS (bounded) for a running verb rather than failing the query on
    every nightly compaction; past ``timeout_s`` it raises — the stage
    dir is preserved and foreachBatch's replay makes the retry safe.
    A dest without table metadata (bare salt-dir sink, nothing a
    lifecycle verb could target) runs unlocked, same rule as
    ``SaltedTable._lifecycle_lock``.

    The lock sentinel is the SIBLING ``<base>.wd_lock`` file
    (``SaltedTable.lock_path``, ADVICE r8): it lives outside the
    directory the verbs swap, so acquiring it can never resurrect an
    empty ``base`` under a mid-swap verb's feet (the in-dir sentinel
    had an exists-then-create window where exactly that happened,
    stranding the staged table one level deep). A verb holds the
    sibling lock continuously across its swap, so an epoch arriving
    mid-swap simply waits on create_atomic until the verb's
    finally-block releases — no metadata re-checking needed.

    Bare-sink classification (no table metadata and no aside copy —
    nothing a lifecycle verb could target) happens ONCE up front and
    runs unlocked."""
    import json as _json
    import socket as _socket
    import time as _time

    from hbasewd_spark.fsutil import try_break_dead_lock

    base = dest_path.rstrip("/")
    meta = base + "/" + META_FILE
    aside = base + ".old"
    if not fs.exists(meta) and not fs.exists(aside):
        yield
        return
    lock = SaltedTable.lock_path(base)
    holder = _json.dumps(
        {
            "verb": f"stream-epoch-{epoch_id}",
            "pid": os.getpid(),
            "host": _socket.gethostname(),
        }
    )
    deadline = _time.monotonic() + timeout_s

    while not fs.create_atomic(lock, holder):
        # a crashed predecessor (driver restart replaying its own
        # epoch) leaves the sentinel behind with a dead pid — the ONE
        # case provable from here; break it and re-race create_atomic.
        # Alive or unprovable holders keep the normal wait-then-raise
        # path (no auto-expiry: a stalled-but-alive verb keeps its
        # lock).
        if try_break_dead_lock(fs, lock):
            continue
        if _time.monotonic() >= deadline:
            try:
                who = fs.read_text(lock)
            except Exception:
                who = "<unreadable>"
            claim_note = (
                f" (a takeover claim also exists at {lock}.break — a "
                f"crashed breaker's claim must be deleted manually after "
                f"verifying its holder is dead)"
                if fs.exists(lock + ".break")
                else ""
            )
            raise RuntimeError(
                f"epoch {epoch_id}: lifecycle lock still held after "
                f"{timeout_s}s ({who}){claim_note}; stage preserved — the "
                f"epoch replay will retry after the verb releases it"
            )
        _time.sleep(poll_s)
    try:
        yield
    finally:
        fs.delete(lock)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events fixture (schema pinned; one file =
    one micro-batch under availableNow)."""
    from hbasewd_spark.sources.loaders import ensure_nanos_conf

    ensure_nanos_conf(spark)
    path = os.path.join(sf_dir, "events.parquet")
    batch = spark.read.parquet(path)
    if os.path.isdir(path):
        # derived scale dirs (tools/make_sf.py) write events.parquet as
        # a parquet DIRECTORY of part files; stream it directly and let
        # availableNow take every part in ONE micro-batch (no rate
        # limit): part-file order is nondeterministic, so slicing this
        # layout into per-file batches could push the watermark past
        # later files' events and drop them — a layout artifact the
        # batch-SQL oracle can't mirror. Single-file driver layout
        # below keeps the one-file-one-batch shape (driver-attested).
        stream = spark.readStream.schema(batch.schema).parquet(path)
    else:
        # FileStreamSource wants a directory: stream sf_dir,
        # glob-filtered to the events file (one file -> one availableNow
        # micro-batch)
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    from hbasewd_spark.sources.loaders import normalize_timestamps

    # shared normalization with the batch loader (nanos-as-bigint and
    # TIMESTAMP_NTZ -> TIMESTAMP; withWatermark rejects NTZ event time)
    return normalize_timestamps(stream)


def idempotent_salted_batch_write(
    batch_df: DataFrame,
    epoch_id: int,
    dest_path: str,
    distributor: KeyDistributor,
    key_col: str,
    lock_timeout_s: float = 300.0,
) -> None:
    """Exactly-once per-epoch salted write: the batch lands in a hidden
    staging dir, then every file moves into its salt partition under a
    name DERIVED FROM THE EPOCH (``epoch-<id>-<seq>.parquet``). A
    replayed epoch (foreachBatch re-delivery after a crash — Spark's
    contract is at-least-once per epoch_id) first purges this epoch's
    previous files (under round-robin salting a replay may salt rows
    differently, so name-overwrite alone isn't enough), then writes the
    same deterministic names — replays are idempotent and the sink is
    exactly-once end-to-end.

    All path operations go through Hadoop's FileSystem (works on any
    scheme Spark can write to, not just the local disk). Staging dirs
    start with '.' so Spark's file listing never sees partial output.

    The stage dir lives INSIDE the table dir, and the staging write
    runs OUTSIDE the lifecycle lock — so a lifecycle verb (compact /
    expire / rebucket) that wins the lock between the stage write and
    this commit can swap ``base -> base.old`` and delete the aside
    copy, destroying the stage (ADVICE r7, medium). The commit
    therefore verifies a stage MANIFEST (written at stage time, listing
    every staged file) after acquiring the lock: if the stage or any
    staged file is gone, it raises so foreachBatch REPLAYS the epoch —
    a silent zero-file commit would lose the epoch's data with no
    replay, since Spark's checkpoint considers the epoch done."""
    out = (
        salted(batch_df, distributor, key_col)
        .repartition(distributor.buckets, F.col(SALT_COL))
        .sortWithinPartitions(SALT_COL, key_col)
    )
    import json as _json

    fs = _Fs(batch_df.sparkSession, dest_path)
    stage = dest_path.rstrip("/") + f"/.staging-epoch-{epoch_id}"
    fs.delete(stage, recursive=True)
    out.write.mode("overwrite").partitionBy(SALT_COL).parquet(stage)
    staged_files = sorted(fs.glob(f"{stage}/{SALT_COL}=*/*.parquet"))
    fs.write_text(
        stage + "/" + STAGE_MANIFEST, _json.dumps({"files": staged_files})
    )
    # COMMIT phase under the lifecycle lock: purge + renames are
    # all-metadata (milliseconds) — the expensive write above stays
    # outside the critical section
    with _epoch_commit_lock(fs, dest_path, epoch_id, lock_timeout_s):
        # the lock is held NOW — but a verb may have held it first and
        # swapped the table dir (taking the stage with it): verify the
        # manifest and every staged file survived before touching the
        # live tree, else raise so the epoch replays
        try:
            manifest = _json.loads(fs.read_text(stage + "/" + STAGE_MANIFEST))
        except Exception:
            raise RuntimeError(
                f"epoch {epoch_id}: stage manifest {stage}/{STAGE_MANIFEST} "
                f"is missing or unreadable — a lifecycle verb swapped the "
                f"table dir between stage and commit; raising so the epoch "
                f"replays"
            )
        gone = [f for f in manifest["files"] if not fs.exists(f)]
        if gone:
            raise RuntimeError(
                f"epoch {epoch_id}: {len(gone)} staged file(s) vanished "
                f"before commit (first: {gone[0]}) — a lifecycle verb "
                f"swapped the table dir between stage and commit; raising "
                f"so the epoch replays"
            )
        # sidecar continuity (VERDICT r7 #2): capture the pre-commit
        # data signature so fresh zone-map sidecars can be maintained
        # incrementally after the renames instead of going stale on
        # every epoch (which would cost a continuously-streaming table
        # its fast_count/scan_merged metadata path permanently)
        tbl = None
        pre_sig = None
        try:
            tbl = SaltedTable.load(batch_df.sparkSession, dest_path)
            pre_sig = tbl._data_signature(fs)
        except Exception:
            tbl = None  # bare sink / unreadable meta: nothing to maintain
        purged: list[str] = []
        for stale in fs.glob(
            f"{dest_path.rstrip('/')}/{SALT_COL}=*/epoch-{epoch_id:010d}-*.parquet"
        ):
            fs.delete(stale)
            purged.append(stale)
        for salt_dir in fs.glob(f"{stage}/{SALT_COL}=*"):
            target_dir = dest_path.rstrip("/") + "/" + salt_dir.rsplit("/", 1)[1]
            fs.mkdirs(target_dir)
            for seq, f in enumerate(fs.glob(f"{salt_dir}/*.parquet")):
                dest = f"{target_dir}/epoch-{epoch_id:010d}-{seq:05d}.parquet"
                if not fs.rename(f, dest):
                    # leave the stage dir intact (this epoch's data lives
                    # there); foreachBatch will retry the epoch and the
                    # purge-then-rewrite protocol makes the retry safe
                    raise IOError(
                        f"epoch {epoch_id}: rename {f} -> {dest} failed; "
                        f"stage {stage} preserved for the retry"
                    )
        fs.delete(stage, recursive=True)
        if tbl is not None:
            import warnings

            # re-glob rather than collecting the rename destinations:
            # the glob renders paths in the filesystem's own URI form
            # (the same spelling the purge glob and the data-signature
            # listing use), so sidecar rows match across replays
            landed = fs.glob(
                f"{dest_path.rstrip('/')}/{SALT_COL}=*/"
                f"epoch-{epoch_id:010d}-*.parquet"
            )
            try:
                tbl.maintain_sidecars_incremental(pre_sig, purged, landed)
            except Exception as e:
                # a failed maintenance leaves the sidecar stale -> the
                # watermark bypasses it (safe, just slower); say so
                warnings.warn(
                    f"epoch {epoch_id}: zone-map sidecar maintenance "
                    f"failed ({e}); sidecars go stale until the next "
                    f"lifecycle verb rebuilds them"
                )


def salted_stream_ingest(
    stream: DataFrame,
    dest_path: str,
    distributor: KeyDistributor,
    key_col: str,
    checkpoint: str,
):
    """Hot-spot-free streaming ingest: stateless salting + per-batch
    exactly-once salted write (idempotent under epoch replay — see
    :func:`idempotent_salted_batch_write`). Returns the started
    StreamingQuery."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        idempotent_salted_batch_write(
            batch_df, epoch_id, dest_path, distributor, key_col
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def windowed_agg_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Event-time tumbling windows with a watermark for late data —
    the streaming twin of relational.tumbling_window_agg (same plan
    shape, same results once the stream drains)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(F.col("win.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def session_window_stream(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Event-time SESSION windows (gap-based, dynamic length) — the
    native Structured Streaming twin of the batch gap-sessionization
    (operators/relational.sessionize): a session's window is
    [first_ts, last_ts + gap), so ``win.end - gap`` IS the last event
    timestamp, which makes the result exactly reconcilable with the
    batch lag+cumsum formulation (and its DuckDB oracle).

    State is per (user, open session) and evicted once the watermark
    passes a session's close — the only shape that survives an
    unbounded stream."""
    return (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            (F.col("win.end") - F.expr(f"INTERVAL {gap}")).alias("session_end"),
            "n_events",
        )
    )


def user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static feature side for :func:`stream_static_enrich`: per-user
    event count tiered against the global mean (heavy >= 1.1x avg,
    light <= 0.9x avg, else mid). Data-relative thresholds keep the
    tiers meaningful at every scale factor; every step is exact
    integer counts plus one deterministic double divide/multiply."""
    from hbasewd_spark.sources.loaders import load_table

    ev = load_table(spark, sf_dir, "events")
    feats = ev.groupBy("user_id").agg(F.count("*").alias("u_events"))
    avg_e = feats.agg(
        (F.sum("u_events").cast("double") / F.count("*")).alias("a")
    )
    return feats.crossJoin(F.broadcast(avg_e)).select(
        "user_id",
        F.when(F.col("u_events") >= F.lit(1.1) * F.col("a"), "heavy")
        .when(F.col("u_events") <= F.lit(0.9) * F.col("a"), "light")
        .otherwise("mid")
        .alias("tier"),
    )


def stream_static_enrich(stream: DataFrame, features: DataFrame) -> DataFrame:
    """Stream-static broadcast join — the online feature-enrichment
    shape: each incoming event is joined to its user's precomputed
    profile (a feature store), then rolled up per (event_type, tier).

    The static side is planned as a broadcast: no state store is
    involved (unlike a stream-stream join), and Spark re-resolves the
    static relation each micro-batch, so a refreshed feature table is
    picked up without restarting the query. At 100 TB: broadcast is
    right while the feature table is a bounded catalog (|users| here);
    when it outgrows the broadcast threshold the same plan degrades
    gracefully to a shuffled stream-static join, or — when per-key
    lookup latency matters more than throughput — the engine's salted
    point-get path (SaltedTable.multi_get) replaces the join."""
    enriched = stream.join(F.broadcast(features), "user_id")
    return enriched.groupBy("event_type", "tier").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )


def scaled_state_partitions(
    spark: SparkSession,
    sf_dir: str,
    table: str = "events",
    target_bytes: int = 32 << 20,
) -> int:
    """Shuffle/state-store partition count for a stateful streaming
    query over ``sf_dir``'s ``table``: one partition per ~32 MB of
    source bytes, clamped to [1, defaultParallelism].

    r13 (VERDICT r12 #8): a stateful streaming query creates ONE state
    store (provider init + per-micro-batch commit + snapshot files)
    per shuffle partition, fixed at query start. With the session
    default pinned to the core count, an availableNow drain of a
    2 MB bench table paid 32 state-store lifecycles per stateful
    operator — a fixed floor that dwarfs the actual aggregation at
    small SF. This derives the count from INPUT VOLUME, not a
    local[32] constant: MB-scale inputs get 1-2 stores, and at
    production volume the same rule yields the cluster's parallelism
    (the deploy's own ceiling), so nothing here is tuned to the bench
    host. Partition count never changes WHAT a streaming aggregation
    computes — only where keys hash — so results are byte-identical.
    """
    path = os.path.join(sf_dir, f"{table}.parquet")
    size = 0
    if os.path.isdir(path):
        for r, _, fs in os.walk(path):
            size += sum(
                os.path.getsize(os.path.join(r, f))
                for f in fs
                if not f.startswith((".", "_"))
            )
    elif os.path.exists(path):
        size = os.path.getsize(path)
    return int(
        max(
            1,
            min(
                spark.sparkContext.defaultParallelism,
                (size + target_bytes - 1) // target_bytes,
            ),
        )
    )


@contextlib.contextmanager
def _stream_shuffle_partitions(spark: SparkSession, n: int | None):
    """Temporarily pin ``spark.sql.shuffle.partitions`` for a stream
    START (the value is captured into the query's offset metadata at
    start; batch queries planned after restore are unaffected)."""
    if not n:
        yield
        return
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def run_stream_to_memory(
    spark: SparkSession,
    agg: DataFrame,
    name: str,
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain an availableNow streaming aggregation into a memory sink
    and return the result table (batch-queryable).

    ``state_partitions`` (see :func:`scaled_state_partitions`) sizes
    the query's state-store count from input volume; None keeps the
    session default."""
    with _stream_shuffle_partitions(spark, state_partitions):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def stream_stream_join(stream: DataFrame) -> DataFrame:
    """Watermarked stream-stream inner join: each purchase joined to
    the same user's clicks in the preceding hour.

    Both sides carry a watermark and the join has a time-range
    constraint, so Spark bounds the join state: click state older than
    (watermark - 1h) is evicted instead of growing forever — the only
    way a stream-stream join survives an unbounded 100 TB/day stream.
    """
    purchases = (
        stream.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("p_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        stream.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("c_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    return joined.select("user_id", "p_id", "c_id", "p_ts", "c_ts")


def run_stream_append_to_memory(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain an append-mode stream (e.g. a stream-stream join) into a
    memory sink and return the result table. ``state_partitions`` as
    in :func:`run_stream_to_memory`."""
    with _stream_shuffle_partitions(spark, state_partitions):
        q = (
            df.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def stateful_user_counter(stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    running per-user event count + last-seen timestamp (the
    'profile-builder' shape). State is one row per user."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, last_ts timestamp"
    state_schema = "n long"

    def update(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        last = None
        for pdf in pdfs:
            n += len(pdf)
            m = pdf["ts"].max()
            last = m if last is None or m > last else last
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "last_ts": [last]})

    return stream.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stateful_user_counter_tws(stream: DataFrame) -> DataFrame:
    """The same per-user running counter on the modern
    ``transformWithStateInPandas`` API (Spark 4): explicit named
    ValueState, per-key Arrow batches, pluggable time modes. Requires
    the RocksDB state store provider (set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...RocksDBStateStoreProvider``) — which is also the provider
    you'd run at 100 TB: state spills to disk + changelog checkpoints
    instead of living on the JVM heap."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class Counter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            n = self._n.get()[0] if self._n.exists() else 0
            last = None
            for pdf in rows:
                n += len(pdf)
                m = pdf["ts"].max()
                last = m if last is None or m > last else last
            self._n.update((n,))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "last_ts": [last]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Counter(),
        outputStructType="user_id long, n_events long, last_ts timestamp",
        outputMode="Update",
        timeMode="None",
    )


def incremental_rollup(
    spark: SparkSession,
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
):
    """Continuous-aggregate maintenance: each micro-batch is aggregated
    to minute resolution and MERGED into a persistent rollup table
    (read old state -> combine on composable measures -> overwrite).

    This is the incremental path of operators/rollup.py: because every
    measure composes (count/decimal-sum/min/max), merging per-batch
    partials is EXACT — after the stream drains, the state table equals
    the batch minute rollup bit-for-bit (asserted in tests). At 100 TB/
    day the per-batch agg output is ~minutes x event_types rows, so the
    merge rewrites a tiny table while the raw stream is never re-read;
    a production sink would MERGE INTO (Delta/Iceberg) instead of the
    snapshot chain used here over plain parquet.

    Replay safety under foreachBatch's at-least-once epoch contract:
    the state is a chain of epoch-stamped COMPLETE snapshots
    (``state_path/epoch=<id>``). A merge for epoch e reads the newest
    snapshot with id < e — so a crash-replayed epoch re-reads the same
    pre-state and rewrites the same snapshot (idempotent), never
    double-merging its partials; a snapshot half-written before a
    crash is invisible to the re-run (id >= e is excluded) and is
    overwritten via stage + atomic rename. Only the snapshot being
    replaced and its predecessor are retained (epochs commit in
    order, so only the newest epoch can ever be replayed). All path
    ops go through the Hadoop FileSystem wrapper, never driver-local
    ``os`` — the state may live on s3a://, hdfs://, etc.

    Read the current state with :func:`read_rollup_state`."""
    merge_batch = _rollup_merge_fn(state_path)
    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _rollup_merge_fn(state_path: str):
    """The foreachBatch merge for :func:`incremental_rollup`, exposed
    so tests can drive epoch replay directly."""

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        part = batch_df.groupBy(
            F.date_trunc("minute", "ts").alias("bucket_ts"), "event_type"
        ).agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sv"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        s = batch_df.sparkSession
        fs = _Fs(s, state_path)
        base = state_path.rstrip("/")
        prior = [
            (eid, p)
            for eid, p in _rollup_snapshots(fs, base)
            if eid < epoch_id
        ]
        merged = part
        if prior:
            old = s.read.parquet(prior[-1][1])
            merged = (
                old.unionByName(part)
                .groupBy("bucket_ts", "event_type")
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("sv").alias("sv"),
                    F.min("min_value").alias("min_value"),
                    F.max("max_value").alias("max_value"),
                )
            )
        # plain-parquet stand-in for MERGE INTO: collect the (tiny)
        # rollup to the driver, then write a fresh snapshot — the raw
        # stream data is never re-read and never re-shuffled
        rows = merged.collect()
        stage = f"{base}/.staging-epoch-{epoch_id}"
        fs.delete(stage, recursive=True)
        s.createDataFrame(rows, merged.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        final = f"{base}/epoch={epoch_id}"
        fs.delete(final, recursive=True)
        if not fs.rename(stage, final):
            raise IOError(
                f"rollup epoch {epoch_id}: rename {stage} -> {final} failed; "
                f"snapshot chain unchanged, epoch will be retried"
            )
        # GC: keep this snapshot + its predecessor (the only one a
        # replay of a NEWER epoch could still need)
        for eid, p in prior[:-1]:
            fs.delete(p, recursive=True)

    return merge_batch


def _rollup_snapshots(fs: _Fs, base: str) -> list[tuple[int, str]]:
    """(epoch_id, path) for every state snapshot, ascending by epoch."""
    out = []
    for p in fs.glob(f"{base}/epoch=*"):
        try:
            out.append((int(p.rsplit("epoch=", 1)[1]), p))
        except ValueError:
            continue
    return sorted(out)


def read_rollup_state(spark: SparkSession, state_path: str) -> DataFrame:
    """The current continuous-aggregate state: the newest complete
    epoch snapshot written by :func:`incremental_rollup`."""
    fs = _Fs(spark, state_path)
    snaps = _rollup_snapshots(fs, state_path.rstrip("/"))
    if not snaps:
        raise FileNotFoundError(f"no rollup state under {state_path}")
    return spark.read.parquet(snaps[-1][1])


def dedup_corpus_ingest(
    stream: DataFrame,
    dest_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Incremental corpus building with cross-batch exact dedup: each
    micro-batch is fingerprinted, deduplicated within the batch
    (deterministically — min id per fingerprint), anti-joined against
    every PREVIOUS epoch's fingerprints, and written to an
    epoch-partitioned directory. The pattern every continuously-crawled
    training corpus needs: a document seen in any earlier batch never
    re-enters the corpus.

    Exactly-once: each epoch writes ``epoch=<id>/`` with overwrite, so
    foreachBatch replay rewrites the same directory (the anti-join
    excludes the replayed epoch's own rows — a replay after later
    epochs landed must not delete its own documents).

    At 100 TB the anti-join probes a slim fingerprint relation
    (8 bytes/doc); bucket the corpus by fingerprint (sources/bucketed)
    to make it a shuffle-free probe. Returns the started query."""
    from pyspark.sql import Window

    from hbasewd_spark.functions.text import fingerprint

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        w = Window.partitionBy("fp").orderBy(id_col)
        batch = (
            batch_df.withColumn("fp", fingerprint(text_col))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        fs = _Fs(spark, dest_path)
        prior_epochs = [
            d
            for d in fs.glob(f"{dest_path.rstrip('/')}/epoch=*")
            if not d.endswith(f"epoch={epoch_id}")
        ]
        if prior_epochs:
            seen = (
                spark.read.option("basePath", dest_path)
                .parquet(*prior_epochs)
                .select("fp")
            )
            batch = batch.join(seen, "fp", "left_anti")
        batch.write.mode("overwrite").parquet(
            dest_path.rstrip("/") + f"/epoch={epoch_id}"
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def neardup_corpus_ingest(
    stream: DataFrame,
    dest_path: str,
    index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Incremental corpus building with cross-batch NEAR-dup admission
    control: each micro-batch is probed against the persisted
    MinHash/LSH band index (operators/minhash_index.py) built from all
    PRIOR epochs; near-dups of already-admitted documents are held
    back, survivors are appended to the corpus AND their signatures to
    the index — :func:`dedup_corpus_ingest`'s exact-fingerprint gate
    upgraded to Jaccard similarity.

    Exactly-once under foreachBatch replay: the corpus epoch dir AND
    the epoch's index partitions (``bands/epoch=<id>``,
    ``hsets/epoch=<id>``) are written with overwrite, and the probe
    reads only OTHER epochs' index partitions — a replayed epoch never
    dedups against its own rows and never double-appends signatures.

    Within-batch near-dups are NOT collapsed here (that is the batch
    operators' job, e.g. dedup_clusters); this gate enforces admission
    against the accumulated corpus, which is the part a growing corpus
    cannot recompute per batch.

    At 100 TB: per epoch the index side streams map-side (the batch is
    the broadcast side of both probe joins); index growth is
    file-append-only. Returns the started query."""
    from hbasewd_spark.operators.dedup import features_of_docs
    from hbasewd_spark.operators.minhash_index import (
        probe_index,
        write_index_relations,
    )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        fs = _Fs(spark, index_path)
        prior_bands = [
            d
            for d in fs.glob(f"{index_path.rstrip('/')}/bands/epoch=*")
            if not d.endswith(f"epoch={epoch_id}")
        ]
        prior_sets = [
            d
            for d in fs.glob(f"{index_path.rstrip('/')}/hsets/epoch=*")
            if not d.endswith(f"epoch={epoch_id}")
        ]
        # ONE signature pass per epoch: the same persisted features
        # frame serves the probe and the index append (the pipeline is
        # the dominant batch-side cost)
        feats = features_of_docs(batch).persist()
        try:
            feats_admitted = feats
            if prior_bands and prior_sets:
                idx_bands = spark.read.option(
                    "basePath", f"{index_path}/bands"
                ).parquet(*prior_bands)
                idx_sets = spark.read.option(
                    "basePath", f"{index_path}/hsets"
                ).parquet(*prior_sets)
                # exclude_self=False: an at-least-once redelivery of an
                # already-admitted (id, text) must match its own prior
                # signature and be held back, not slip past a same-id
                # exclusion
                dupes = (
                    probe_index(
                        spark,
                        batch,
                        idx_bands,
                        idx_sets,
                        exclude_self=False,
                        new_feats=feats,
                    )
                    .select(F.col("new_doc_id").alias("doc_id"))
                    .distinct()
                )
                batch = batch.join(F.broadcast(dupes), "doc_id", "left_anti")
                feats_admitted = feats.join(F.broadcast(dupes), "doc_id", "left_anti")
            batch.write.mode("overwrite").parquet(
                dest_path.rstrip("/") + f"/epoch={epoch_id}"
            )
            write_index_relations(
                feats_admitted,
                f"{index_path.rstrip('/')}/bands/epoch={epoch_id}",
                f"{index_path.rstrip('/')}/hsets/epoch={epoch_id}",
                "overwrite",
            )
        finally:
            feats.unpersist()

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def sliding_window_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Event-time SLIDING windows (1-hour length, 15-minute slide):
    each event contributes to 4 overlapping windows. Completes the
    window-type coverage next to the tumbling
    (:func:`windowed_agg_stream`) and session
    (:func:`session_window_stream`) variants.

    At scale the state store holds (window x key) partial aggregates —
    4x the tumbling cardinality for this slide ratio, still bounded by
    the watermark horizon; Spark expands each event to its covering
    windows BEFORE the shuffle, so partial aggregation stays map-side
    combinable."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(F.col("win.start").alias("window_start"), "event_type", "n", "sum_value")
    )
