"""Structured Streaming tests (SURVEY.md §5 streaming-specific):
bounded file sources driven to completion, streaming output compared to
the equivalent batch aggregation (batch-streaming unification = oracle),
watermark eviction, late-data handling, and the three-sink fan-out.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from stream_processing_project_spark.sources.fixtures import load_table
from stream_processing_project_spark.streaming import pipeline, sinks
from tests.conftest import SF_SMOKE, spool_parquet


def test_streaming_minute_counts_equals_batch(spark):
    """Append-mode windowed agg == batch agg over watermark-closed windows."""
    events = pipeline.file_event_stream(spark, SF_SMOKE)
    got = pipeline.run_to_completion(pipeline.minute_counts_stream(events))

    batch = load_table(spark, SF_SMOKE, "events")
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    expected = (
        batch.groupBy(
            F.date_trunc("minute", "ts").alias("wm"),
            F.col("event_type").alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_val"))
        .filter(
            F.col("wm") + F.expr("INTERVAL 1 MINUTE")
            <= F.lit(max_ts) - F.expr("INTERVAL 15 MINUTES")
        )
        .select(
            F.date_format("wm", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "key",
            "cnt",
            "sum_val",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))
    assert got.count() > 0


def test_streaming_late_data_dropped_after_watermark(spark):
    """A3 — rows later than the watermark are dropped from closed windows
    (the 900 s TTL analogue, EngagementRedisSink.scala:22)."""
    sc_dir = tempfile.mkdtemp(prefix="spe-late-")
    base = [
        (1, "2024-01-01 00:00:10", "a", 1.0),
        (2, "2024-01-01 01:00:00", "a", 1.0),  # advances watermark to 00:45
    ]
    late = [(3, "2024-01-01 00:00:20", "a", 1.0)]  # window closed → dropped

    def write(rows, name):
        spool_parquet(
            sc_dir, rows, "event_id long, ts timestamp, key0 string, value double"
        )

    write(base, "b1")
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, key0 string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(sc_dir)
        .withWatermark("ts", "15 minutes")
        .groupBy(F.window("ts", "1 minute").alias("win"), "key0")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("w"), "key0", "cnt")
    )
    import uuid

    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", pipeline.checkpoint_dir("late"))
        .start()
    )
    q.processAllAvailable()
    write(late, "b2")  # arrives after watermark passed its window
    q.processAllAvailable()
    q.stop()
    rows = {(r.w, r.cnt) for r in spark.table(name).collect()}
    # the 00:00 window was emitted with ONLY the on-time row
    assert ("2024-01-01 00:00:00", 1) in rows
    assert ("2024-01-01 00:00:00", 2) not in rows


def test_streaming_cdc_sessions_match_batch_sessionizer(spark):
    """Streaming session_window vs the batch lag/cumsum sessionizer:
    session counts per user agree for sessions the watermark closed."""
    got = (
        pipeline.run_to_completion(
            pipeline.session_stream(pipeline.cdc_event_stream(spark, SF_SMOKE))
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    # batch twin over the same CDC-filtered rows (op in r,c)
    from pyspark.sql import Window

    ev = load_table(spark, SF_SMOKE, "events").filter(
        ~F.pmod(F.col("event_id"), F.lit(20)).isin(0, 1)
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    batch = (
        ev.withColumn(
            "is_new",
            F.when(prev.isNull() | ((us - prev) > 1_800_000_000), 1).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("is_new").alias("n_sessions"))
    )
    got_map = {r.user_id: r.n_sessions for r in got.collect()}
    batch_map = {r.user_id: r.n_sessions for r in batch.collect()}
    # streaming emits only closed sessions → counts ≤ batch, most equal
    assert set(got_map) <= set(batch_map)
    matched = sum(1 for u, n in got_map.items() if batch_map[u] in (n, n + 1))
    assert matched == len(got_map)
    # CDC truncates event_ts to seconds — session identity is unaffected


def test_fanout_three_sinks(spark):
    """K1-K4: serving snapshot, warehouse append, partitioned search table
    all materialize from one bounded run."""
    events = pipeline.file_event_stream(spark, SF_SMOKE)
    enriched = pipeline.enriched_stream(events, load_table(spark, SF_SMOKE, "customer"))
    agg = (
        events.withWatermark("ts", "15 minutes")
        .groupBy(F.col("event_type").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_val"))
    )
    serving = tempfile.mkdtemp(prefix="t-serving-")
    warehouse = tempfile.mkdtemp(prefix="t-warehouse-")
    search = tempfile.mkdtemp(prefix="t-search-")
    qs = sinks.start_fanout(enriched, agg, serving, warehouse, search)
    try:
        for q in qs:
            q.processAllAvailable()
    finally:
        for q in qs:
            q.stop()

    n_events = load_table(spark, SF_SMOKE, "events").count()
    board = spark.read.parquet(serving)
    assert {r.board for r in board.collect()} == {"top_by_engagement", "top_by_access"}
    assert board.filter(F.col("board") == "top_by_access").count() == 5
    assert spark.read.parquet(warehouse).count() == n_events  # exactly-once append
    search_df = spark.read.parquet(search)
    assert search_df.count() == n_events
    assert "event_date" in search_df.columns and "indexed_at" in search_df.columns
    # daily partitioning materialized as directories (the "daily index" layout)
    import os

    assert any(d.startswith("event_date=") for d in os.listdir(search))


def test_monitor_snapshot_and_renderer(spark):
    """S5 operational loop (reference monitor.py:197-296): snapshot the
    three sinks, derive rates between polls, render lag and boards —
    all from local tables and native lastProgress, no network scrape."""
    from stream_processing_project_spark import monitor

    events = pipeline.file_event_stream(spark, SF_SMOKE)
    enriched = pipeline.enriched_stream(events, load_table(spark, SF_SMOKE, "customer"))
    agg = (
        events.withWatermark("ts", "15 minutes")
        .groupBy(F.col("event_type").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_val"))
    )
    serving = tempfile.mkdtemp(prefix="t-mon-serving-")
    warehouse = tempfile.mkdtemp(prefix="t-mon-warehouse-")
    search = tempfile.mkdtemp(prefix="t-mon-search-")
    qs = sinks.start_fanout(enriched, agg, serving, warehouse, search)
    try:
        for q in qs:
            q.processAllAvailable()
        n = load_table(spark, SF_SMOKE, "events").count()
        snap = monitor.take_snapshot(
            spark, serving, warehouse, search, source_count=n, queries=qs
        )
        assert snap.warehouse_count == n and snap.search_count == n
        assert {b[0] for b in snap.boards} == {"top_by_engagement", "top_by_access"}
        assert not snap.errors
        frame = monitor.render(snap)
        assert "caught up" in frame and "top_by_access" in frame
        assert f"{n:,}" in frame
        # rates between two polls: simulate growth on the prev snapshot
        import dataclasses

        prev = dataclasses.replace(
            snap, ts=snap.ts - 10.0, warehouse_count=snap.warehouse_count - 50
        )
        assert monitor.rates(prev, snap)["warehouse"] == 5.0
        # a missing sink is an error row, not a crash
        broken = monitor.take_snapshot(spark, "/nonexistent-a", "/nonexistent-b", search)
        assert set(broken.errors) == {"serving", "warehouse"}
        assert "! serving" in monitor.render(broken)
        # the loop drives the same path end to end
        frames = []
        monitor.monitor_loop(
            spark, serving, warehouse, search,
            interval_s=0.0, iterations=2, out=frames.append,
        )
        assert len(frames) == 2 and "warehouse" in frames[0]
    finally:
        for q in qs:
            q.stop()


def test_redis_connector_body_matches_table_sink(spark):
    """K2 with a real foreachBatch connector body attached (VERDICT r02
    "What's missing" #2): the dict-backed fake Redis client — same
    pipeline()/hincrby/zincrby/expire/delete/zadd surface as redis-py —
    must end up holding exactly the boards the parquet serving sink
    materializes, with per-key counters and TTLs set."""
    from stream_processing_project_spark.streaming.connectors import (
        SERVING_TTL_S,
        FakeRedisClient,
        redis_serving_sink,
    )

    def agg():
        return (
            pipeline.file_event_stream(spark, SF_SMOKE)
            .withWatermark("ts", "15 minutes")
            .groupBy(F.col("event_type").alias("key"))
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.round(F.sum("value"), 2).alias("sum_val"),
            )
        )

    serving = tempfile.mkdtemp(prefix="t-redis-serving-")
    fake = FakeRedisClient()
    q_table = sinks.serving_topk_sink(agg(), serving)
    q_redis = redis_serving_sink(agg(), lambda: fake)
    try:
        q_table.processAllAvailable()
        q_redis.processAllAvailable()
    finally:
        q_table.stop()
        q_redis.stop()

    board = spark.read.parquet(serving)
    want_eng = {
        (r.key, round(r.score, 9))
        for r in board.filter(F.col("board") == "top_by_engagement").collect()
    }
    want_acc = {
        (r.key, float(r.score))
        for r in board.filter(F.col("board") == "top_by_access").collect()
    }
    got_eng = {(k, round(v, 9)) for k, v in fake.zsets["top_by_engagement"].items()}
    got_acc = set(fake.zsets["top_by_access"].items())
    assert got_eng == want_eng
    assert got_acc == want_acc
    # per-key counters + TTL discipline (EngagementRedisSink.scala:22,126-158)
    batch = load_table(spark, SF_SMOKE, "events").groupBy("event_type").count()
    for r in batch.collect():
        assert fake.hashes[f"engagement:{r.event_type}"]["access_count"] == r["count"]
        assert fake.ttls[f"engagement:{r.event_type}"] == SERVING_TTL_S
    assert fake.ttls["top_by_engagement"] == SERVING_TTL_S


def test_redis_connector_restates_totals_across_micro_batches(spark):
    """Complete mode re-states cumulative totals every batch, so the
    connector must REBUILD (delete+set), never accumulate — an additive
    ZINCRBY would double-count the running sum on every micro-batch."""
    from stream_processing_project_spark.streaming.connectors import (
        FakeRedisClient,
        redis_serving_sink,
    )

    src = tempfile.mkdtemp(prefix="t-redis-2b-")
    def write(rows):
        spool_parquet(
            src, rows, "event_id long, ts timestamp, key string, value double"
        )

    write([(1, "2024-01-01 00:00:00", "view", 10.0)])
    agg = (
        spark.readStream.schema("event_id long, ts timestamp, key string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "15 minutes")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_val"))
    )
    fake = FakeRedisClient()
    q = redis_serving_sink(agg, lambda: fake)
    try:
        q.processAllAvailable()
        assert fake.zsets["engagement_sum"] == {"view": 10.0}
        write([(2, "2024-01-01 00:01:00", "view", 5.0)])  # second micro-batch
        q.processAllAvailable()
    finally:
        q.stop()
    # cumulative total is 15.0 — NOT 10 + 15 = 25 (the double-count bug)
    assert fake.zsets["engagement_sum"] == {"view": 15.0}
    assert fake.hashes["engagement:view"]["access_count"] == 2


def test_redis_connector_crash_recovery_converges(spark):
    """K2 crash/recovery (the serving twin of the BQ/ES exactly-once
    test): the driver crashes AFTER the Redis write but BEFORE the
    epoch commits — the worst spot. On restart from the same
    checkpoint the aggregate state restores, the uncommitted epoch
    replays, and the delete-and-rebuild body restates an IDENTICAL
    snapshot; new data then lands cumulatively. Final store must equal
    the no-crash run exactly — no double counts, nothing lost."""
    import pytest

    from stream_processing_project_spark.streaming.connectors import (
        FakeRedisClient,
        make_redis_serving_body,
        redis_serving_sink,
    )

    src = tempfile.mkdtemp(prefix="t-redis-crash-")
    ckpt = tempfile.mkdtemp(prefix="t-redis-crash-ckpt-")

    def write(rows):
        spool_parquet(
            src, rows, "event_id long, ts timestamp, key string, value double"
        )

    def agg():
        return (
            spark.readStream.schema(
                "event_id long, ts timestamp, key string, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .withWatermark("ts", "15 minutes")
            .groupBy("key")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.round(F.sum("value"), 2).alias("sum_val"),
            )
        )

    fake = FakeRedisClient()
    write([(1, "2024-01-01 00:00:00", "view", 10.0)])
    body = make_redis_serving_body(lambda: fake)

    def crashing(df, epoch_id):
        body(df, epoch_id)
        raise RuntimeError("simulated driver crash before commit")

    q = (
        agg()
        .writeStream.outputMode("complete")
        .foreachBatch(crashing)
        .option("checkpointLocation", ckpt)
        .start()
    )
    with pytest.raises(Exception):
        q.processAllAvailable()
    q.stop()
    # the write landed before the crash — the store already serves batch 1
    assert fake.zsets["engagement_sum"] == {"view": 10.0}

    write([(2, "2024-01-01 00:01:00", "view", 5.0)])
    q = redis_serving_sink(agg(), lambda: fake, checkpoint_location=ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # uncommitted epoch replayed (idempotent restatement), batch 2 landed
    # cumulatively on the RESTORED aggregate state: 15.0, count 2 —
    # exactly the no-crash result
    assert fake.zsets["engagement_sum"] == {"view": 15.0}
    assert fake.hashes["engagement:view"]["access_count"] == 2


def test_transition_log_bridges_micro_batch_boundary(spark):
    """The stored last event must feed the FIRST pair of the next
    micro-batch: two time-ordered batches through transition_log_stream
    emit the boundary-crossing transition exactly once (ADVICE r02 —
    the single-file fixture runs as one micro-batch and never exercised
    the bridge)."""
    import uuid

    from stream_processing_project_spark.operators.stateful import (
        transition_log_stream,
    )

    src = tempfile.mkdtemp(prefix="spe-transition-")
    def write(rows):
        spool_parquet(
            src, rows,
            "user_id long, event_id long, ts timestamp, event_type string",
        )

    write([(1, 10, "2024-01-01 00:00:00", "view"), (1, 11, "2024-01-01 00:01:00", "cart")])
    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = f"transitions_{uuid.uuid4().hex[:8]}"
    q = (
        transition_log_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", pipeline.checkpoint_dir("transition_bridge"))
        .start()
    )
    q.processAllAvailable()
    batch1 = sorted(map(tuple, spark.table(name).collect()))
    assert batch1 == [(1, "view", "cart")]
    write([(1, 12, "2024-01-01 00:02:00", "purchase")])  # second micro-batch
    q.processAllAvailable()
    q.stop()
    rows = sorted(map(tuple, spark.table(name).collect()))
    # the (cart, purchase) pair spans the batch boundary — exactly once
    assert rows == [(1, "cart", "purchase"), (1, "view", "cart")]


def test_minhash_bucket_state_bridges_micro_batches(spark):
    """Online near-dup: a doc arriving in a LATER micro-batch must be
    flagged against a bucket claimed in an EARLIER one (running-min
    bucket state persists across batches)."""
    import uuid

    from stream_processing_project_spark.operators.dedup import md5_minhash_bands
    from stream_processing_project_spark.operators.stateful import (
        bucket_first_seen_stream,
    )

    src = tempfile.mkdtemp(prefix="spe-minhash-")
    text = "the quick brown fox jumps over the lazy dog again and again"

    def write(rows):
        spool_parquet(src, rows, "doc_id long, text string")

    write([(1, text), (2, "completely different words entirely here now")])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = f"minhash_{uuid.uuid4().hex[:8]}"
    q = (
        bucket_first_seen_stream(md5_minhash_bands(stream))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", pipeline.checkpoint_dir("minhash_bridge"))
        .start()
    )
    q.processAllAvailable()
    write([(3, text)])  # exact copy of doc 1, second micro-batch
    q.processAllAvailable()
    q.stop()
    log = spark.table(name)
    doc3 = log.filter(F.col("doc_id") == 3).collect()
    assert len(doc3) == 4  # all four bands emitted
    assert all(r.first_seen == 1 for r in doc3)  # matched doc 1 across the batch boundary
    doc1 = log.filter(F.col("doc_id") == 1).collect()
    assert all(r.first_seen is None for r in doc1)  # first claimant


def test_stateful_running_totals_accumulate_across_batches(spark):
    """applyInPandasWithState: state persists between micro-batches —
    a key seen in two batches emits its CUMULATIVE total the second time
    (the Redis running-counter semantic, EngagementRedisSink.scala:132-148)."""
    import tempfile
    import uuid

    from stream_processing_project_spark.operators.stateful import (
        running_totals_stream,
    )

    src = tempfile.mkdtemp(prefix="spe-stateful-")
    def write(rows):
        spool_parquet(src, rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string")

    write([(1, "2024-01-01 00:00:01", 7, "play", 2.0, "{}"),
           (2, "2024-01-01 00:00:02", 7, "play", 3.0, "{}"),
           (3, "2024-01-01 00:00:03", 8, "click", 1.0, "{}")])

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = f"st_{uuid.uuid4().hex[:8]}"
    q = (
        running_totals_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", pipeline.checkpoint_dir("stateful"))
        .start()
    )
    q.processAllAvailable()
    write([(4, "2024-01-01 00:00:04", 7, "finish", 5.0, "{}")])  # batch 2
    q.processAllAvailable()
    q.stop()

    log = [(r.user_id, r.n_events, r.total_value) for r in spark.table(name).collect()]
    assert (7, 2, 5.0) in log  # batch-1 emission
    assert (7, 3, 10.0) in log  # batch-2 emission: state carried over
    assert (8, 1, 1.0) in log
    # user 8 untouched in batch 2 → exactly one emission
    assert len([e for e in log if e[0] == 8]) == 1


def test_streaming_dedup_across_batches_within_watermark(spark):
    """dropDuplicatesWithinWatermark: a duplicate key arriving in a LATER
    micro-batch is still dropped while its first occurrence is inside the
    watermark."""
    import tempfile
    import uuid

    src = tempfile.mkdtemp(prefix="spe-dedup-")
    def write(rows):
        spool_parquet(src, rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string")

    write([(1, "2024-01-01 00:00:01", 7, "play", 1.0, "{}"),
           (2, "2024-01-01 00:00:02", 8, "click", 2.0, "{}")])

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = f"dd_{uuid.uuid4().hex[:8]}"
    q = (
        pipeline.dedup_stream(stream, watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", pipeline.checkpoint_dir("dedup"))
        .start()
    )
    q.processAllAvailable()
    # batch 2: event_id 1 again (dup, within watermark) + a new id 3
    write([(1, "2024-01-01 00:00:01", 7, "play", 1.0, "{}"),
           (3, "2024-01-01 00:00:05", 9, "finish", 3.0, "{}")])
    q.processAllAvailable()
    q.stop()
    ids = sorted(r.event_id for r in spark.table(name).collect())
    assert ids == [1, 2, 3]  # the batch-2 duplicate of id 1 was dropped


def test_jsonl_sink_roundtrip(spark):
    """K6 — JSONL sink writes one JSON object per line; reading the sink
    back yields the source rows exactly."""
    events = pipeline.file_event_stream(spark, SF_SMOKE).select(
        "event_id", "user_id", "event_type"
    )
    out = tempfile.mkdtemp(prefix="spe-jsonl-")
    q = sinks.jsonl_sink(events, out)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.json(out)
    src = load_table(spark, SF_SMOKE, "events")
    assert got.count() == src.count()
    assert {r.event_id for r in got.select("event_id").collect()} == {
        r.event_id for r in src.select("event_id").collect()
    }


def test_debug_sink_runs_sampled(spark):
    """K5 — sampled console branch starts, processes the bounded stream,
    and terminates cleanly (output goes to stdout; the assertion is the
    lifecycle, the sampling predicate is pinned in test_sampling)."""
    events = pipeline.file_event_stream(spark, SF_SMOKE)
    q = sinks.debug_sink(events, sample_pct=1.0)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert q.exception() is None


def test_sampling_deterministic_pct(spark):
    """P7 — deterministic id-residue sampling: exact fraction on a dense
    id range and stable across invocations."""
    from stream_processing_project_spark.functions.scalar import deterministic_sample

    df = spark.range(0, 1000)
    picked = df.filter(deterministic_sample(F.col("id"), 5))
    assert picked.count() == 50
    assert sorted(r.id for r in picked.collect()) == sorted(
        r.id for r in df.filter(deterministic_sample(F.col("id"), 5)).collect()
    )


def test_rocksdb_state_store_matches_default(spark):
    """The RocksDB state-store provider (the high-key-cardinality scale
    path, session.ROCKSDB_STATE_CONF) produces the same windowed result
    as the default HDFS-backed provider. Set per-query via the conf so
    the shared session is untouched."""
    from stream_processing_project_spark.session import ROCKSDB_STATE_CONF

    key = "spark.sql.streaming.stateStore.providerClass"
    default = pipeline.run_to_completion(
        pipeline.minute_counts_stream(pipeline.file_event_stream(spark, SF_SMOKE))
    )
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_STATE_CONF[key])
    try:
        rocks = pipeline.run_to_completion(
            pipeline.minute_counts_stream(pipeline.file_event_stream(spark, SF_SMOKE))
        )
        assert sorted(map(tuple, rocks.collect())) == sorted(
            map(tuple, default.collect())
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_search_table_partition_pruning(spark):
    """K4 scale property: the date-partitioned search table prunes at
    the scan — a day-filtered read lists only that day's partition (the
    daily-ES-index read pattern, ElasticsearchSink.scala:184-186)."""
    out = tempfile.mkdtemp(prefix="spe-prune-")
    (
        load_table(spark, SF_SMOKE, "events")
        .withColumn("event_date", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(out)
    )
    one_day = (
        spark.read.parquet(out)
        .filter(F.col("event_date") == "2024-01-01")
    )
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_date" in plan, plan
    # pruned scan reads a single partition directory
    n_days = spark.read.parquet(out).select("event_date").distinct().count()
    assert n_days > 1  # fixture spans multiple days, so pruning is real


def test_stream_stream_interval_join(spark):
    """Watermarked stream-stream interval join: pairs within the gap
    emit exactly once; pairs outside the gap (or before) never emit."""
    import uuid

    src = tempfile.mkdtemp(prefix="spe-ssj-")
    rows = [
        (1, "2024-01-01 00:00:00", 7, "play", 1.0, "{}"),
        (2, "2024-01-01 00:10:00", 7, "finish", 1.0, "{}"),   # +10m → pair
        (3, "2024-01-01 01:10:00", 7, "finish", 1.0, "{}"),   # +70m → too late
        (4, "2024-01-01 00:05:00", 8, "play", 1.0, "{}"),
        (5, "2024-01-01 00:04:00", 8, "finish", 1.0, "{}"),   # BEFORE → no pair
        # watermark pusher so earlier windows close
        (6, "2024-01-02 00:00:00", 9, "play", 1.0, "{}"),
    ]
    spool_parquet(src, rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string", mode="overwrite")

    def stream():
        return spark.readStream.schema(
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string"
        ).parquet(src)

    plays = stream().filter(F.col("event_type") == "play")
    finishes = stream().filter(F.col("event_type") == "finish")
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        pipeline.interval_join_stream(plays, finishes)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", pipeline.checkpoint_dir("ssj"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.l_event_id, r.r_event_id, r.gap_us) for r in spark.table(name).collect()}
    assert got == {(1, 2, 600_000_000)}  # only the in-gap forward pair


def test_query_metrics_exposes_monitor_surface(spark):
    """S5/A9 — lastProgress-derived metrics carry rows processed, rate,
    batch duration, and windowed-agg state size (the monitor's numbers,
    natively)."""
    import uuid

    events = pipeline.file_event_stream(spark, SF_SMOKE)
    name = f"met_{uuid.uuid4().hex[:8]}"
    q = (
        pipeline.minute_counts_stream(events)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", pipeline.checkpoint_dir("metrics"))
        .start()
    )
    try:
        q.processAllAvailable()
        m = sinks.query_metrics(q)
    finally:
        q.stop()
    assert m["num_input_rows"] is not None
    assert m["batch_duration_ms"] > 0
    assert m["state_rows_total"] > 0  # open windows live in the state store
    assert m["watermark"] is not None


def test_streaming_sliding_windows_equal_batch(spark):
    """A4 — streaming sliding windows (append mode) equal the batch
    sliding-window aggregation restricted to watermark-closed windows
    (batch-streaming unification)."""
    got = pipeline.run_to_completion(
        pipeline.sliding_counts_stream(pipeline.file_event_stream(spark, SF_SMOKE))
    )
    batch = load_table(spark, SF_SMOKE, "events")
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    expected = (
        batch.groupBy(
            F.window("ts", "10 minutes", "1 minute").alias("win"),
            F.col("event_type").alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("win_cnt"), F.round(F.sum("value"), 2).alias("win_sum"))
        .filter(F.col("win.end") <= F.lit(max_ts) - F.expr("INTERVAL 15 MINUTES"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "key",
            "win_cnt",
            "win_sum",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))
    assert got.count() > 0


def test_exactly_once_across_restart(spark):
    """Exactly-once through checkpointed file sinks: stop a query after
    the first micro-batch, write more input, restart with the SAME
    checkpoint — the sink ends up with every event exactly once (the
    reference silently drops on overflow and loses buffers on crash,
    EngagementRedisSink.scala:91-93; SURVEY.md §2.4)."""
    import uuid

    src = tempfile.mkdtemp(prefix="spe-eo-src-")
    out = tempfile.mkdtemp(prefix="spe-eo-out-")
    ckpt = pipeline.checkpoint_dir("eo")
    def write(rows):
        spool_parquet(src, rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string")

    def start():
        return (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long,"
                " event_type string, value double, props string"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    write([(1, "2024-01-01 00:00:01", 7, "a", 1.0, "{}"),
           (2, "2024-01-01 00:00:02", 7, "b", 2.0, "{}")])
    q = start()
    q.processAllAvailable()
    q.stop()  # "crash" after batch 1 is committed

    write([(3, "2024-01-01 00:00:03", 8, "c", 3.0, "{}")])
    q = start()  # restart from the same checkpoint
    q.processAllAvailable()
    q.stop()

    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]  # no duplicates, no losses


def test_upsert_view_tombstones_block_resurrection(spark, tmp_path):
    """Three micro-batches, adversarial order: insert(ts=1) → delete(ts=3)
    → out-of-order older update(ts=2). The retained tombstone must win,
    so key 1 stays deleted; key 2's newest update wins normally."""
    from stream_processing_project_spark.streaming.sinks import (
        upsert_materialized_view,
    )

    schema = "id long, user_id long, event_type string, value double, __op string, __ts_ms long"
    batches = [
        [(1, 10, "view", 1.0, "c", 1), (2, 20, "view", 1.0, "c", 1)],
        [(1, 10, None, None, "d", 3), (2, 20, "click", 2.0, "u", 5)],
        [(1, 10, "view", 9.9, "u", 2)],  # older than the delete
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        spool_parquet(str(src / f"b{i}"), rows, schema, mode="overwrite")
    # feed files one per micro-batch in a deterministic order via glob dirs
    stream = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b*"))
    )
    q, versions = upsert_materialized_view(stream, str(tmp_path / "state"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(versions) >= 1
    final = {
        r.id: (r["__ts_ms"], r["__op"], r.value)
        for r in spark.read.parquet(versions[-1]).collect()
    }
    # key 1: tombstone (ts=3) beat the late ts=2 update; key 2: ts=5 update
    assert final[1][1] == "d"
    assert final[2] == (5, "u", 2.0)
    live = spark.read.parquet(versions[-1]).filter("__op != 'd'").collect()
    assert [r.id for r in live] == [2]


def test_ingest_audit_observes_parse_drops(spark, tmp_path):
    """observe() metrics count total vs parsed records in-flight: 3 of 5
    envelope lines are malformed, and the audit reports 5/2 without an
    extra pass or a separate counting query."""
    from stream_processing_project_spark.sources.cdc import parse_envelope
    from stream_processing_project_spark.streaming import pipeline

    lines = [
        '{"payload": {"id": 1, "user_id": 10, "event_type": "view", "event_ts": "2024-01-01 00:00:00", "value": 1.0, "props": "{}", "__op": "c", "__table": "events", "__db": "d", "__ts_ms": 1}}',
        '{"payload": {"id": 2, "user_id": 20, "event_type": "click", "event_ts": "2024-01-01 00:00:01", "value": 2.0, "props": "{}", "__op": "r", "__table": "events", "__db": "d", "__ts_ms": 2}}',
        "not json",
        "",
        '{"payload": 42}',
    ]
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("\n".join(lines))
    raw = (
        spark.readStream.format("text")
        .schema("value string")
        .load(str(src))
    )
    audited = pipeline.with_ingest_audit(raw)
    parsed = parse_envelope(audited)
    q = (
        parsed.writeStream.outputMode("append")
        .format("memory")
        .queryName("audit_t")
        .option("checkpointLocation", pipeline.checkpoint_dir("audit_t"))
        .start()
    )
    try:
        q.processAllAvailable()
        m = pipeline.observed_metrics(q)
    finally:
        q.stop()
    assert m["total_records"] == 5
    assert m["parsed"] == 2
    assert spark.table("audit_t").count() == 2


def test_upsert_changelog_emits_effective_diffs_only(spark, tmp_path):
    """Change data feed from the upsert view: batch 0 → two inserts;
    batch 1 → one delete + one update; batch 2 (an out-of-order update
    older than the tombstone) → NO change rows at all — the feed
    reflects effective state transitions, not raw input."""
    from stream_processing_project_spark.streaming.sinks import (
        upsert_materialized_view,
    )

    schema = "id long, user_id long, event_type string, value double, __op string, __ts_ms long"
    batches = [
        [(1, 10, "view", 1.0, "c", 1), (2, 20, "view", 1.0, "c", 1)],
        [(1, 10, None, None, "d", 3), (2, 20, "click", 2.0, "u", 5)],
        [(1, 10, "view", 9.9, "u", 2)],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        spool_parquet(str(src / f"b{i}"), rows, schema, mode="overwrite")
    stream = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b*"))
    )
    base = str(tmp_path / "state")
    q, versions = upsert_materialized_view(stream, base, emit_changelog=True)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    feed = spark.read.parquet(f"{base}/_changelog")
    got = sorted(
        (r.batch, r.id, r.change_type) for r in feed.collect()
    )
    assert got == [
        (0, 1, "insert"),
        (0, 2, "insert"),
        (1, 1, "delete"),
        (1, 2, "update"),
    ]


def test_continuous_rollup_refreshes_only_touched_hours(spark, tmp_path):
    """Two micro-batches: the second touches only hour 10, so hour 11
    carries over from the previous version while hour 10 re-aggregates
    from minute partials — the incremental continuous-aggregate refresh."""
    from stream_processing_project_spark.streaming.sinks import (
        continuous_hour_rollup,
    )

    schema = "w_start string, key string, cnt long, sum_val double"
    src = tmp_path / "src"
    src.mkdir()
    base = str(tmp_path / "rollup")

    def write(name, rows):
        spool_parquet(str(src / name), rows, schema, mode="overwrite")

    write("f0", [("2024-01-01 10:00:00", "a", 2, 1.0),
                 ("2024-01-01 10:30:00", "a", 3, 2.5),
                 ("2024-01-01 11:00:00", "a", 1, 1.0)])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "f*"))
    )
    q, versions = continuous_hour_rollup(stream, base)
    try:
        q.processAllAvailable()
        assert len(versions) == 1
        write("f1", [("2024-01-01 10:45:00", "a", 1, 0.5)])
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(versions) == 2
    final = {
        (r.hb.strftime("%Y-%m-%d %H:%M:%S"), r.key): (r.cnt, r.sum_val)
        for r in spark.read.parquet(versions[-1]).collect()
    }
    assert final == {
        ("2024-01-01 10:00:00", "a"): (6, 4.0),
        ("2024-01-01 11:00:00", "a"): (1, 1.0),
    }


def test_dim_refresh_needs_foreachbatch_reload(spark, tmp_path):
    """Two truths about stream-static enrichment, both pinned: (a) a
    static parquet DataFrame declared in the streaming plan caches its
    file listing — dimension files added mid-stream are NOT seen; (b)
    re-loading the dimension inside foreachBatch
    (sinks.fresh_dim_enrich_sink) IS fresh per micro-batch. The README
    freshness claim rests on (b)."""
    from stream_processing_project_spark.streaming.sinks import (
        fresh_dim_enrich_sink,
    )

    dim_dir = str(tmp_path / "dim")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    spool_parquet(dim_dir, [(10, "OLD")], "user_id long, seg string")
    spool_parquet(src, [(1, 10)], "event_id long, user_id long")

    events = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = fresh_dim_enrich_sink(
        events, lambda s: s.read.parquet(dim_dir), out
    )
    try:
        q.processAllAvailable()
        spool_parquet(dim_dir, [(20, "NEW")], "user_id long, seg string")
        spool_parquet(src, [(2, 20)], "event_id long, user_id long")
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r.event_id: r.seg for r in spark.read.parquet(out).collect()}
    assert rows == {1: "OLD", 2: "NEW"}  # (b): batch-2 sees the new dim row


def test_dim_refresh_plan_static_is_load_once(spark, tmp_path):
    """Reference-parity half of the dim-refresh pair (VERDICT r08 task
    6a; EngagementProcessor.scala:147-148): the J1 path's plan-declared
    static side (enriched_stream's join shape) pins its parquet file
    LISTING at plan time, so a dimension row added mid-stream is NOT
    seen by later micro-batches — the engine reproduces the reference's
    load-once snapshot semantics exactly when the dimension is declared
    in the plan. Freshness is the documented opt-in divergence
    (fresh_dim_enrich_sink, pinned in the companion test above)."""
    from stream_processing_project_spark.streaming.pipeline import (
        checkpoint_dir,
    )

    dim_dir = str(tmp_path / "dim")
    src = str(tmp_path / "src")
    spool_parquet(dim_dir, [(10, "OLD")], "user_id long, seg string")
    spool_parquet(src, [(1, 10)], "event_id long, user_id long")

    events = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    dim = spark.read.parquet(dim_dir)  # plan-declared static side
    joined = events.join(F.broadcast(dim), "user_id", "left")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("dim_load_once")
        .option("checkpointLocation", checkpoint_dir("dim_load_once"))
        .start()
    )
    try:
        q.processAllAvailable()
        # dimension UPDATE lands as a new file + an event referencing it
        spool_parquet(dim_dir, [(20, "NEW")], "user_id long, seg string")
        spool_parquet(src, [(2, 20)], "event_id long, user_id long")
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        r.event_id: r.seg
        for r in spark.sql("SELECT * FROM dim_load_once").collect()
    }
    # batch 2's event joins against the STARTUP dim snapshot: the new
    # dimension row is invisible → left-outer null (reference parity)
    assert rows == {1: "OLD", 2: None}


def test_incremental_drain_available_now(spark):
    """Trigger.AvailableNow drains what exists, terminates, and a rerun
    with the same checkpoint processes ONLY files that arrived in
    between — exactly-once scheduled ingestion, no duplicates."""
    import os

    src = tempfile.mkdtemp(prefix="spe-drain-src-")
    out = tempfile.mkdtemp(prefix="spe-drain-out-")
    ckpt = tempfile.mkdtemp(prefix="spe-drain-ckpt-")

    def arrive(rows, name):
        spool_parquet(
            os.path.join(src, name), rows, "event_id long, value double",
            mode="overwrite",
        )

    def drain():
        stream = spark.readStream.schema("event_id long, value double").option(
            "maxFilesPerTrigger", "1"
        ).parquet(src + "/*")
        q = sinks.incremental_drain_sink(stream, out, ckpt)
        q.awaitTermination(120)
        assert not q.isActive  # AvailableNow terminates on its own
        return spark.read.parquet(out)

    arrive([(1, 1.0), (2, 2.0)], "batch_a")
    first = drain()
    assert sorted(r.event_id for r in first.collect()) == [1, 2]

    arrive([(3, 3.0)], "batch_b")
    second = drain()
    assert sorted(r.event_id for r in second.collect()) == [1, 2, 3]


def test_checkpoint_recovery_exactly_once(spark):
    """Kill a parquet-sink streaming query mid-run, restart it on the
    SAME checkpoint, and drain: the file-sink commit log must yield every
    input row exactly once — the real exactly-once guarantee the
    reference claims but its buffered sinks can't deliver (SURVEY.md
    §2.4: events dropped on buffer overflow, state lost on crash)."""
    import os
    import time

    src = tempfile.mkdtemp(prefix="spe-rec-src-")
    out = tempfile.mkdtemp(prefix="spe-rec-out-")
    ckpt = tempfile.mkdtemp(prefix="spe-rec-ckpt-")
    for part in range(6):
        spool_parquet(
            os.path.join(src, f"f{part}"),
            [(i, float(i)) for i in range(part * 100, (part + 1) * 100)],
            "event_id long, value double",
            mode="overwrite",
        )

    def start():
        stream = (
            spark.readStream.schema("event_id long, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*")
        )
        return (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="50 milliseconds")
            .start()
        )

    q = start()
    deadline = time.time() + 60
    while time.time() < deadline and len(q.recentProgress) < 2:
        time.sleep(0.2)
    q.stop()  # interrupt mid-stream, offsets committed for some prefix

    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got == list(range(600))  # every row exactly once, no dupes/gaps


def test_ewma_state_bridges_micro_batch_boundary(spark):
    """The stored (n, acc) must seed the next micro-batch's fold: two
    time-ordered batches produce the same final EWMA as one fold over
    the whole history (and the first batch's emission is the fold of
    its prefix alone)."""
    import uuid

    from stream_processing_project_spark.operators.stateful import ewma_stream

    src = tempfile.mkdtemp(prefix="spe-ewma-")
    def write(rows):
        spool_parquet(
            src, rows, "user_id long, event_id long, ts timestamp, value double"
        )

    write([(1, 10, "2024-01-01 00:00:00", 1.0), (1, 11, "2024-01-01 00:01:00", 2.0)])
    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = f"ewma_{uuid.uuid4().hex[:8]}"
    q = (
        ewma_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", pipeline.checkpoint_dir("ewma_bridge"))
        .start()
    )
    q.processAllAvailable()
    # prefix fold: acc = 100; then 0.25*200 + 0.75*100 = 125
    batch1 = sorted(map(tuple, spark.table(name).collect()))
    assert batch1 == [(1, 2, 125.0)]
    write([(1, 12, "2024-01-01 00:02:00", 0.5)])  # second micro-batch
    q.processAllAvailable()
    q.stop()
    rows = sorted(map(tuple, spark.table(name).collect()))
    # bridge: 0.25*50 + 0.75*125 = 106.25 — seeded by stored state,
    # not re-seeded by the new batch's first row
    assert rows == [(1, 2, 125.0), (1, 3, 106.25)]


def test_ols_state_bridges_micro_batch_boundary(spark):
    """The stored sufficient statistics must seed the next micro-batch:
    two time-ordered batches end at the same fit as one batch over the
    whole history, late cents for an ALREADY-SEEN hour fold into Σy/Σxy
    without re-counting the hour, and a new hour extends n/Σx/Σx²."""
    import uuid

    from stream_processing_project_spark.operators.stateful import ols_stream

    src = tempfile.mkdtemp(prefix="spe-ols-")
    def write(rows):
        spool_parquet(
            src, rows,
            "event_type string, event_id long, ts timestamp, value double",
        )

    origin = 473352  # x = epoch-hour - origin; 2024-01-01 00:00 → x = 0
    # hours x=0 (100 cents) and x=1 (300 cents): slope 2.0, intercept 100
    write([("play", 1, "2024-01-01 00:10:00", 1.0),
           ("play", 2, "2024-01-01 01:10:00", 3.0)])
    stream = (
        spark.readStream.schema(
            "event_type string, event_id long, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = f"ols_{uuid.uuid4().hex[:8]}"
    q = (
        ols_stream(stream, origin)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", pipeline.checkpoint_dir("ols_bridge"))
        .start()
    )
    q.processAllAvailable()
    first = {(r.updates, r.n, r.slope, r.intercept)
             for r in spark.table(name).collect()}
    assert first == {(1, 2, 200.0, 100.0)}  # cents/hour slope over x=0,1
    # late cents in hour x=1 (+100) and a new hour x=2 (400 cents):
    # points now (0,100),(1,400),(2,400) → slope 150, intercept 150
    write([("play", 3, "2024-01-01 01:40:00", 1.0),
           ("play", 4, "2024-01-01 02:10:00", 4.0)])
    q.processAllAvailable()
    q.stop()
    last = {(r.updates, r.n, r.slope, r.intercept)
            for r in spark.table(name).collect() if r.updates == 2}
    assert last == {(2, 3, 150.0, 150.0)}


def test_pit_feature_state_bridges_micro_batch_boundary(spark):
    """The per-user feature profile must bridge batches: a label in
    the second micro-batch sees features accumulated in the first;
    a feature sharing the label's exact timestamp is EXCLUDED (the
    leakage rule), and features never include the label's own batch
    successors."""
    import uuid

    from stream_processing_project_spark.operators.stateful import (
        pit_feature_stream,
    )

    src = tempfile.mkdtemp(prefix="spe-pit-")
    def write(rows):
        spool_parquet(
            src, rows,
            "user_id long, event_id long, ts timestamp,"
            " event_type string, value double",
        )

    write([(1, 10, "2024-01-01 00:00:00", "view", 1.0),
           (1, 11, "2024-01-01 00:01:00", "click", 2.0)])
    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, ts timestamp,"
            " event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = f"pit_{uuid.uuid4().hex[:8]}"
    q = (
        pit_feature_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", pipeline.checkpoint_dir("pit_bridge"))
        .start()
    )
    q.processAllAvailable()
    assert spark.table(name).count() == 0  # no labels yet
    # second batch: a feature AT the label's exact ts (must be excluded),
    # the label, then a later feature (must not leak backwards)
    write([(1, 12, "2024-01-01 00:02:00", "play", 3.0),
           (1, 13, "2024-01-01 00:02:00", "purchase", 99.0),
           (1, 14, "2024-01-01 00:03:00", "view", 5.0)])
    q.processAllAvailable()
    q.stop()
    rows = [tuple(r) for r in spark.table(name).collect()]
    # features strictly before 00:02:00: events 10 (100c) + 11 (200c)
    assert rows == [(1, 13, 1704067320000000, 2, 300)]


def test_state_partition_cap_is_scale_safe():
    """r12 (VERDICT r11 what's-wrong #3): the old unconditional
    state_partitions=12 default silently capped ANY session — a
    production session with shuffle.partitions=2000 ran its streams at
    12 state partitions. The derived default must never cap a
    large-parallelism session down to the fixture constant, while an
    explicit request (the bench / fixture gates) still caps downward
    and small adversarial layouts pass through unchanged."""
    from stream_processing_project_spark.streaming.pipeline import (
        state_partition_cap,
    )

    # large production session, no explicit request: floor at its own
    # parallelism, NOT at 12
    assert state_partition_cap("2000", None, 800) == 800
    # explicit fixture-scale request still caps downward
    assert state_partition_cap("2000", 12, 800) == 12
    # adversarial small layout (the 7/5 rehearsal) passes through
    assert state_partition_cap("7", None, 32) == 7
    assert state_partition_cap("7", 12, 32) == 7
    # the bench pins its session to 12 — derived default keeps it
    assert state_partition_cap("12", None, 32) == 12
    # unparseable session conf falls back to the derived floor
    assert state_partition_cap(None, None, 32) == 32
