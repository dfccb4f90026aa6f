"""Structured Streaming tests: salted streaming ingest parity with the
batch write path, windowed-agg parity, and the custom stateful operator."""

import pytest
from pyspark.sql import functions as F

from hbasewd_spark.plans.distributor import HashDistributor
from hbasewd_spark.sources.salted_table import SaltedTable
from hbasewd_spark.streaming import ingest as ST


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from hbasewd_spark.sources.loaders import load_table

    return load_table(spark, sf_dir, "events").cache()


def test_salted_stream_ingest_matches_batch(spark, sf_dir, events, tmp_path_factory):
    """readStream -> salt -> foreachBatch append produces the same
    salted table contents as a batch SaltedTable.write."""
    base = tmp_path_factory.mktemp("stream")
    dest, ckpt = str(base / "tbl"), str(base / "ckpt")
    d = HashDistributor(8)
    stream = ST.stream_events(spark, sf_dir)
    q = ST.salted_stream_ingest(stream, dest, d, "ts", ckpt)
    q.awaitTermination()

    streamed = spark.read.parquet(dest)
    assert streamed.count() == events.count()
    # same salt assignment as the batch path (stateless deterministic salt)
    batch_path = str(base / "batch")
    SaltedTable.write(events, batch_path, d, "ts")
    batch = spark.read.parquet(batch_path)
    a = streamed.groupBy("salt").count().orderBy("salt").collect()
    b = batch.groupBy("salt").count().orderBy("salt").collect()
    assert [(r.salt, r["count"]) for r in a] == [(r.salt, r["count"]) for r in b]
    # scans over the streamed table behave like a SaltedTable
    t = SaltedTable(spark, dest, d, "ts")
    lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    n = t.scan(start=lo, stop=hi).count()  # stop exclusive -> drops max row(s)
    n_max = events.where(F.col("ts") == hi).count()
    assert n == events.count() - n_max


def test_windowed_agg_stream_matches_batch(spark, sf_dir, events):
    stream = ST.stream_events(spark, sf_dir)
    agg = ST.windowed_agg_stream(stream)
    out = ST.run_stream_to_memory(spark, agg, "t_win_agg")
    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(F.col("win.start").alias("window_start"), "event_type", "n", "sum_value")
    )
    got = {(r.window_start, r.event_type): (r.n, r.sum_value) for r in out.collect()}
    exp = {(r.window_start, r.event_type): (r.n, r.sum_value) for r in batch.collect()}
    assert got == exp


def test_stateful_user_counter(spark, sf_dir, events):
    stream = ST.stream_events(spark, sf_dir)
    counted = ST.stateful_user_counter(stream)
    q = (
        counted.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_user_counter")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.user_id: r.n_events
        for r in spark.sql(
            "SELECT user_id, max(n_events) AS n_events FROM t_user_counter GROUP BY user_id"
        ).collect()
    }
    exp = {r.user_id: r["count"] for r in events.groupBy("user_id").count().collect()}
    assert got == exp


def test_watermark_drops_late_data_keeps_in_watermark(spark, tmp_path_factory):
    """Late-data semantics, driven batch-by-batch through a file source:
    an event older than the watermark is DROPPED (its window never
    appears in the append-mode output), while a late-but-within-
    watermark event is merged into its (still-open) window. This is the
    contract that bounds state size at 100 TB: watermark = how long a
    window stays correctable, and anything older is load-shed exactly
    once, deterministically."""
    import datetime as dt

    from pyspark.sql import types as T

    base = tmp_path_factory.mktemp("late")
    src, ckpt = str(base / "src"), str(base / "ckpt")
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def emit(*hours_minutes):
        rows = [
            (dt.datetime(2024, 1, 1, h, m), "a", 1.0) for h, m in hours_minutes
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    emit((10, 0), (10, 30), (12, 0))  # batch 1: watermark after = 11:00
    stream = spark.readStream.schema(schema).parquet(src)
    agg = ST.windowed_agg_stream(stream, watermark="1 hour")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1
        # batch 2: 09:15 is older than the 11:00 watermark -> dropped;
        # 11:30 is late (10:30 window already emitted? no - 11:00 window)
        # but within watermark -> kept; 14:00 advances the clock
        emit((9, 15), (11, 30), (14, 0))
        q.processAllAvailable()
        emit((20, 0))  # push watermark past every earlier window
        q.processAllAvailable()
        emit((21, 0))  # one more batch so 14:00's window finalizes
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.window_start.strftime("%H:%M"): r.n
        for r in spark.sql("SELECT * FROM t_late").collect()
    }
    assert "09:00" not in got  # too-late event load-shed
    assert got["10:00"] == 2
    assert got["11:00"] == 1  # late but within watermark: kept
    assert got["12:00"] == 1
    assert got["14:00"] == 1


def test_stateful_user_counter_tws_matches_batch(spark, sf_dir, events):
    """transformWithStateInPandas twin of the applyInPandasWithState
    counter — same results, modern state API, RocksDB provider.

    The TWS driver worker speaks protobuf to the state server; skip
    where google.protobuf isn't installed (this container) — the
    operator itself is plain PySpark and runs wherever protobuf is."""
    pytest.importorskip("google.protobuf.descriptor")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = ST.stream_events(spark, sf_dir)
        counted = ST.stateful_user_counter_tws(stream)
        q = (
            counted.writeStream.outputMode("update")
            .format("memory")
            .queryName("t_user_counter_tws")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            r.user_id: r.n_events
            for r in spark.sql(
                "SELECT user_id, max(n_events) AS n_events"
                " FROM t_user_counter_tws GROUP BY user_id"
            ).collect()
        }
        exp = {r.user_id: r["count"] for r in events.groupBy("user_id").count().collect()}
        assert got == exp
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_ingest_epoch_replay_is_idempotent(spark, sf_dir, events, tmp_path_factory):
    """foreachBatch delivers at-least-once per epoch; the sink must make
    that exactly-once. Replaying an epoch (same id, same data) rewrites
    the same deterministic file names instead of appending duplicates."""
    base = tmp_path_factory.mktemp("replay")
    dest = str(base / "tbl")
    d = HashDistributor(8)
    batch = events.where(F.col("event_id") < 1000)
    n0 = batch.count()
    ST.idempotent_salted_batch_write(batch, 0, dest, d, "ts")
    n1 = spark.read.parquet(dest).count()
    files1 = sorted(
        str(p.relative_to(dest)) for p in __import__("pathlib").Path(dest).rglob("*.parquet")
    )
    # crash-replay of the SAME epoch: no duplicates, identical files
    ST.idempotent_salted_batch_write(batch, 0, dest, d, "ts")
    assert spark.read.parquet(dest).count() == n1 == n0
    files2 = sorted(
        str(p.relative_to(dest)) for p in __import__("pathlib").Path(dest).rglob("*.parquet")
    )
    assert files2 == files1
    # a NEW epoch appends alongside
    nxt = events.where((F.col("event_id") >= 1000) & (F.col("event_id") < 1500))
    ST.idempotent_salted_batch_write(nxt, 1, dest, d, "ts")
    assert spark.read.parquet(dest).count() == n0 + nxt.count()


def test_dedup_corpus_ingest_cross_batch_and_replay(spark, tmp_path_factory):
    """A document seen in ANY earlier micro-batch never re-enters the
    corpus; within-batch duplicates keep the min doc_id; and replaying
    an epoch after later epochs landed neither duplicates nor deletes
    its own documents."""
    base = tmp_path_factory.mktemp("dedup_ingest")
    src, dest, ckpt = str(base / "src"), str(base / "dst"), str(base / "ckpt")
    schema = "doc_id long, text string"

    b1 = [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha  BETA ")]  # 3 ~ 1
    b2 = [(4, "alpha beta"), (5, "epsilon zeta"), (6, "epsilon zeta")]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = ST.dedup_corpus_ingest(stream, dest, ckpt)
    q.awaitTermination()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
    q2 = ST.dedup_corpus_ingest(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        dest,
        ckpt,
    )
    q2.awaitTermination()

    got = {r.doc_id: r.text for r in spark.read.parquet(dest).collect()}
    # 3 dups 1 within batch 1 (normalized fingerprint); 4 dups 1 across
    # batches; 6 dups 5 within batch 2
    assert set(got) == {1, 2, 5}
    # re-running the availableNow query over the same checkpoint (a
    # full restart with no new files) leaves the corpus unchanged
    q3 = ST.dedup_corpus_ingest(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        dest,
        ckpt,
    )
    q3.awaitTermination()
    got2 = {r.doc_id: r.text for r in spark.read.parquet(dest).collect()}
    assert got2 == got


def test_stream_static_enrich_matches_batch_and_broadcasts(spark, sf_dir):
    """The stream-static join must produce exactly the batch join's
    rollup once the availableNow stream drains, and the static feature
    side must enter the plan as a broadcast (no state store for the
    join itself — only the downstream aggregation keeps state)."""
    from pyspark.sql import functions as F

    from hbasewd_spark.sources.loaders import load_table
    from hbasewd_spark.streaming import ingest as ST

    feats = ST.user_features(spark, sf_dir)
    stream = ST.stream_events(spark, sf_dir)
    agg = ST.stream_static_enrich(stream, feats)
    streamed = ST.run_stream_to_memory(spark, agg, "t_ss_enrich")

    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.join(feats, "user_id")
        .groupBy("event_type", "tier")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
    )
    got = {tuple(r) for r in streamed.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(got) > 0

    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
