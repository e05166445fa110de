"""The three-sink fan-out (SURVEY.md §2.5 K1-K6) as Structured Streaming
queries over Spark-managed tables.

Reference: one Flink job pushes the same enriched stream to Redis (hot,
windowed top-k), BigQuery (warm, append warehouse), Elasticsearch (cold,
daily-index search) through hand-rolled buffers that silently DROP
events on overflow (EngagementRedisSink.scala:91-93 et al.). Spark gives
the fan-out as N writeStream queries off one source with real
backpressure (maxFilesPerTrigger/maxOffsetsPerTrigger) and checkpointed
exactly-once file sinks — we keep the stronger guarantee (SURVEY.md §2.4
notes).

Sink → table mapping (§7 guiding decisions):
  serving   — complete-mode top-k snapshot, delete-and-rebuild per batch
              via foreachBatch overwrite (= the Redis sorted-set rebuild,
              EngagementRedisSink.scala:186-197)
  warehouse — parquet append, 8 s trigger (= BigQuery batching, .env:30-34)
  search    — parquet append partitioned by event_date + indexed_at
              column, 5 s trigger (= daily ES indices,
              ElasticsearchSink.scala:184-186,214)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from stream_processing_project_spark.streaming.pipeline import checkpoint_dir

# Reference flush intervals (.env:20-43) → per-sink triggers.
SERVING_TRIGGER = "500 milliseconds"
WAREHOUSE_TRIGGER = "8 seconds"
SEARCH_TRIGGER = "5 seconds"


def serving_topk_sink(
    agg_stream: DataFrame,
    out_path: str,
    k_engagement: int = 3,
    k_access: int = 5,
    trigger: str = SERVING_TRIGGER,
) -> StreamingQuery:
    """K2 — the hot serving view: per batch, rebuild the top-k snapshot
    from the complete aggregate state and atomically overwrite the
    serving table (reference: delete sorted set + rebuild,
    EngagementRedisSink.scala:186-197; monitor reads top-3/top-5,
    monitor.py:167-185)."""

    def rebuild(batch_df: DataFrame, epoch_id: int) -> None:
        snap = (
            batch_df.withColumn(
                "avg_val", F.col("sum_val") / F.greatest(F.col("cnt"), F.lit(1))
            )
            .withColumn(
                "rk_eng",
                F.row_number().over(
                    Window.orderBy(F.col("avg_val").desc_nulls_last(), F.col("key"))
                ),
            )
        )
        top_eng = snap.filter(F.col("rk_eng") <= k_engagement).select(
            F.lit("top_by_engagement").alias("board"),
            "key",
            F.col("avg_val").alias("score"),
            F.col("rk_eng").alias("rank"),
        )
        w2 = Window.orderBy(F.col("cnt").desc_nulls_last(), F.col("key"))
        top_acc = (
            snap.withColumn("rk_acc", F.row_number().over(w2))
            .filter(F.col("rk_acc") <= k_access)
            .select(
                F.lit("top_by_access").alias("board"),
                "key",
                F.col("cnt").cast("double").alias("score"),
                F.col("rk_acc").alias("rank"),
            )
        )
        top_eng.unionAll(top_acc).coalesce(1).write.mode("overwrite").parquet(out_path)

    return (
        agg_stream.writeStream.outputMode("complete")
        .foreachBatch(rebuild)
        .trigger(processingTime=trigger)
        .option("checkpointLocation", checkpoint_dir("serving"))
        .start()
    )


def warehouse_sink(
    enriched: DataFrame, out_path: str, trigger: str = WAREHOUSE_TRIGGER
) -> StreamingQuery:
    """K3 — append warehouse table (parquet, checkpointed exactly-once;
    the reference's BigQuery insertAll + JSONL fallback collapse into
    Spark's native file sink)."""
    return (
        enriched.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir("warehouse"))
        .trigger(processingTime=trigger)
        .start()
    )


def search_sink(
    enriched: DataFrame, out_path: str, trigger: str = SEARCH_TRIGGER
) -> StreamingQuery:
    """K4 — date-partitioned search table (= daily ES indices) with the
    index-time `indexed_at` stamp (@timestamp, ElasticsearchSink.scala:214).
    Partition pruning on event_date gives the daily-index read pattern."""
    return (
        enriched.withColumn("event_date", F.to_date("ts"))
        .withColumn("indexed_at", F.current_timestamp())
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir("search"))
        .partitionBy("event_date")
        .trigger(processingTime=trigger)
        .start()
    )


def start_fanout(
    enriched: DataFrame,
    agg_stream: DataFrame,
    serving_path: str,
    warehouse_path: str,
    search_path: str,
) -> list[StreamingQuery]:
    """K1 — the full fan-out: three concurrent queries off one source
    (the reference's keyBy×3 branches, EngagementProcessor.scala:197-213;
    per-branch shuffle keys are unnecessary here — the file sinks don't
    require co-location, and the agg shuffles on its own group keys)."""
    return [
        serving_topk_sink(agg_stream, serving_path),
        warehouse_sink(enriched, warehouse_path),
        search_sink(enriched, search_path),
    ]


def debug_sink(
    stream: DataFrame, sample_pct: float = 1.0, trigger: str = SERVING_TRIGGER
) -> StreamingQuery:
    """K5 — sampled console/debug branch: P7 sampling (reference:
    Random.nextInt(100) < rate, EngagementProcessor.scala:188) + single
    writer (.print() with parallelism 1, EngagementProcessor.scala:187-192).
    Observability costs 1% of the stream, not a full copy."""
    sampled = stream.filter(F.rand() < sample_pct / 100.0).coalesce(1)
    return (
        sampled.writeStream.outputMode("append")
        .format("console")
        .option("truncate", "true")
        .option("numRows", "5")
        .trigger(processingTime=trigger)
        .option("checkpointLocation", checkpoint_dir("debug"))
        .start()
    )


def jsonl_sink(
    stream: DataFrame, out_path: str, trigger: str = WAREHOUSE_TRIGGER
) -> StreamingQuery:
    """K6 — fixed-schema JSONL file sink: the reference's failure-path
    fallback files (BigQuerySink.scala:221-240, ElasticsearchSink.scala:
    284-303) as a first-class checkpointed sink — one JSON object per
    line, exactly-once via the file-sink commit log instead of a lossy
    side channel."""
    return (
        stream.writeStream.outputMode("append")
        .format("json")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir("jsonl"))
        .trigger(processingTime=trigger)
        .start()
    )


def query_metrics(query: StreamingQuery) -> dict:
    """S5/A9 — the monitor's observability surface, natively: rates and
    state size from StreamingQuery.lastProgress (the reference scrapes
    per-sink COUNT(*)s and Kafka offsets over the network to derive the
    same numbers, monitor.py:197-254)."""
    p = query.lastProgress
    if p is None:
        return {}
    state = p.get("stateOperators") or []
    return {
        "batch_id": p.get("batchId"),
        "num_input_rows": p.get("numInputRows"),
        "input_rows_per_second": p.get("inputRowsPerSecond"),
        "processed_rows_per_second": p.get("processedRowsPerSecond"),
        "batch_duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
        "state_rows_total": sum(s.get("numRowsTotal", 0) for s in state),
        "watermark": (p.get("eventTime") or {}).get("watermark"),
    }


def upsert_materialized_view(
    changes: DataFrame,
    base_dir: str,
    key_col: str = "id",
    ts_col: str = "__ts_ms",
    emit_changelog: bool = False,
) -> tuple[StreamingQuery, list]:
    """Incremental CDC upsert maintenance: every micro-batch is reduced
    to latest-per-key (tombstones kept) and MERGED with the accumulated
    state, written copy-on-write to a new version directory — the
    foreachBatch MERGE pattern on plain parquet (with Delta/Iceberg the
    write becomes `MERGE INTO` and versions collapse into the table
    log; the seam is exactly this function). Out-of-order changes are
    safe: the merge key order is (ts, ...) and retained tombstones stop
    older inserts from resurrecting deleted keys.

    With `emit_changelog`, each batch also appends its EFFECTIVE diff —
    (change_type ∈ insert/update/delete, row) under
    `{base_dir}/_changelog/batch=N` — a change data feed downstream
    incremental consumers replay instead of diffing snapshots. Effective
    means post-merge: a batch whose changes all lose to retained state
    (e.g. an out-of-order update older than a tombstone) emits NOTHING.

    Scale: state per version is |live keys| rows, batch work is one
    partial-aggregated shuffle of |batch keys| plus (with changelog) a
    key-join against current state; the full-state rewrite per batch is
    the plain-parquet cost — a table format or key-bucketed layout
    (operators/bucketing.py) turns it into touched-bucket-only
    rewrites. Returns (query, version_paths) — read
    `version_paths[-1]`, filter `__op != 'd'` for the current table."""
    from stream_processing_project_spark.sources.cdc import latest_versions

    versions: list[str] = []

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        new = latest_versions(batch_df, key_col, ts_col)
        cur = spark.read.parquet(versions[-1]) if versions else None
        merged = (
            latest_versions(cur.unionByName(new), key_col, ts_col)
            if cur is not None
            else new
        )
        path = f"{base_dir}/v{epoch_id}"
        merged.write.mode("overwrite").parquet(path)
        versions.append(path)
        if not emit_changelog:
            return
        if cur is not None:
            prev = cur.select(
                key_col,
                F.col(ts_col).alias("_prev_ts"),
                F.col("__op").alias("_prev_op"),
            )
            delta = merged.join(prev, key_col, "left")
        else:
            delta = merged.withColumn("_prev_ts", F.lit(None)).withColumn(
                "_prev_op", F.lit(None)
            )
        prev_live = F.col("_prev_ts").isNotNull() & (F.col("_prev_op") != "d")
        log = (
            delta.filter(
                F.col("_prev_ts").isNull() | (F.col(ts_col) > F.col("_prev_ts"))
            )
            .withColumn(
                "change_type",
                F.when(
                    F.col("__op") == "d",
                    F.when(prev_live, "delete"),  # tombstone for a dead key: no-op
                ).otherwise(F.when(prev_live, "update").otherwise("insert")),
            )
            .filter(F.col("change_type").isNotNull())
            .drop("_prev_ts", "_prev_op")
        )
        log.write.mode("overwrite").parquet(
            f"{base_dir}/_changelog/batch={epoch_id}"
        )

    q = (
        changes.writeStream.outputMode("append")
        .foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir(f"upsert_{abs(hash(base_dir))}"))
        .start()
    )
    return q, versions


def upsert_materialized_view_bucketed(
    changes: DataFrame,
    base_dir: str,
    key_col: str = "id",
    ts_col: str = "__ts_ms",
    n_buckets: int = 16,
    bucket_expr=None,
) -> tuple[StreamingQuery, list[dict[int, str]]]:
    """The bucket-partitioned twin of upsert_materialized_view — the
    production lever its docstring names: state lives in `n_buckets`
    buckets (default: xxhash64(key) mod n), tracked by a bucket → path
    manifest, and each micro-batch MERGES AND REWRITES ONLY the buckets
    that contain changed keys. Untouched buckets carry forward as
    manifest entries pointing at the version that last wrote them —
    zero read, zero write, zero shuffle for cold state. Per-batch cost
    drops from O(|state|) (the copy-on-write full rewrite) to
    O(|state ∩ touched buckets|).

    Bucket function choice is the locality lever: hash buckets prune
    when a batch's DISTINCT-KEY COUNT is small versus n_buckets (a
    scattered hot set of 50 keys touches ≤ 50 buckets no matter where
    they sit); pass `bucket_expr` (any deterministic Column over the
    key, e.g. `(F.col("id") / width).cast("int")` range clustering —
    the Delta/Iceberg clustered-table analogue) when change batches are
    key-RANGE-local, the common CDC shape where recent ids are hot —
    then a 1% hot range touches ~1% of buckets and the batch rewrites
    gigabytes, not terabytes. With uniform random keys every batch
    touches every bucket and this degrades gracefully to the
    full-rewrite cost plus a partition-write constant (the trade
    PLANS.md's sf10 curve documents).

    Same merge semantics as the unbucketed sink: latest-per-key via the
    partial-aggregatable struct-max, tombstones retained per bucket so
    out-of-order older inserts cannot resurrect deleted keys (a key's
    whole history lands in ONE bucket — any deterministic
    key-partitioning preserves the per-key merge exactly). The
    per-batch driver collect is the touched bucket-id list
    (≤ n_buckets ints — the bounded-scalar pattern).

    The manifest IS the table log in miniature: with Delta/Iceberg this
    function collapses into `MERGE INTO` over a clustered table and the
    manifest into the commit log. Returns (query, manifest_snapshots);
    read the final state with read_bucketed_state(spark, snapshots[-1])."""
    from stream_processing_project_spark.sources.cdc import latest_versions

    manifest: dict[int, str] = {}
    snapshots: list[dict[int, str]] = []
    bucket_of = (
        bucket_expr
        if bucket_expr is not None
        else F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
    )

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # Persist the reduced batch: the touched-bucket collect and the
        # bucket write are SEPARATE actions, and without a persist each
        # one recomputes the latest-per-key aggregation from the raw
        # batch (measured: the initial bulk load ran 3 aggregations of
        # the full batch and came out slower than the unbucketed sink).
        new = (
            latest_versions(batch_df, key_col, ts_col)
            .withColumn("bkt", bucket_of)
            .persist()
        )
        try:
            touched = sorted(
                r["bkt"]
                for r in new.select("bkt").distinct().collect()
            )
            if not touched:
                snapshots.append(dict(manifest))
                return
            _merge_touched(spark, new, touched, epoch_id)
        finally:
            new.unpersist()

    def _merge_touched(spark, new, touched, epoch_id: int) -> None:
        prev_paths = [manifest[b] for b in touched if b in manifest]
        if prev_paths:
            # bucket dirs are read directly (no basePath), so the
            # partition column is gone — recompute it from the key
            cur = spark.read.parquet(*prev_paths).withColumn(
                "bkt", bucket_of
            )
            merged = latest_versions(
                cur.unionByName(new).drop("bkt"), key_col, ts_col
            ).withColumn("bkt", bucket_of)
        else:
            merged = new
        path = f"{base_dir}/v{epoch_id}"
        # One shuffle partition per touched bucket before the
        # partitioned write: without it every upstream task opens a
        # file in every touched dir (tasks × buckets small files — the
        # initial full load wrote ~2048 of them and measured SLOWER
        # than the unbucketed rewrite); with it each bucket dir is one
        # well-sized file and downstream bucket reads stay one-file.
        merged.repartition(len(touched), "bkt").write.mode(
            "overwrite"
        ).partitionBy("bkt").parquet(path)
        for b in touched:
            manifest[b] = f"{path}/bkt={b}"
        snapshots.append(dict(manifest))

    q = (
        changes.writeStream.outputMode("append")
        .foreachBatch(merge)
        .option(
            "checkpointLocation",
            checkpoint_dir(f"upsertb_{abs(hash(base_dir))}"),
        )
        .start()
    )
    return q, snapshots


def read_bucketed_state(spark, manifest: dict[int, str]) -> DataFrame:
    """Assemble the current state of a bucket-manifested upsert view:
    one parquet read over the manifest's bucket paths (each bucket
    contributes exactly its latest version — possibly written many
    versions ago, if it has been cold since)."""
    paths = [manifest[b] for b in sorted(manifest)]
    return spark.read.parquet(*paths)


def continuous_hour_rollup(
    minute_stream: DataFrame, base_dir: str
) -> tuple[StreamingQuery, list]:
    """Continuous-aggregate refresh (the hypertable pattern,
    olap_rollup_cascade's streaming twin): closed 1-minute windows
    append to a minute-grain table; each batch then re-aggregates ONLY
    the hours it touched from minute partials and merges them into a
    copy-on-write hour table. Raw events are never re-read — the hour
    grain always derives from minute partials (count/sum compose
    losslessly), and refresh cost per batch is O(minutes in touched
    hours), independent of table history.

    Scale: the minute append is the only per-event work; the hour merge
    reads back |touched hours| × |keys| partial rows. At 100 TB,
    partition the minute table by hour so the touched-hour filter is
    partition pruning, and cascade further levels (day from hour) the
    same way. Returns (query, hour_version_paths)."""
    versions: list[str] = []

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        batch_df.write.mode("append").parquet(f"{base_dir}/minute")
        hb = F.date_trunc("hour", F.to_timestamp("w_start"))
        touched = [r[0] for r in batch_df.select(hb.alias("hb")).distinct().collect()]
        minutes = spark.read.parquet(f"{base_dir}/minute").withColumn("hb", hb)
        recomputed = (
            minutes.filter(F.col("hb").isin(touched))
            .groupBy("hb", "key")
            .agg(
                F.sum("cnt").cast("long").alias("cnt"),
                F.round(F.sum("sum_val"), 2).alias("sum_val"),
            )
        )
        if versions:
            kept = spark.read.parquet(versions[-1]).filter(
                ~F.col("hb").isin(touched)
            )
            recomputed = kept.unionByName(recomputed)
        path = f"{base_dir}/hour_v{epoch_id}"
        recomputed.write.mode("overwrite").parquet(path)
        versions.append(path)

    q = (
        minute_stream.writeStream.outputMode("append")
        .foreachBatch(step)
        .option(
            "checkpointLocation", checkpoint_dir(f"rollup_{abs(hash(base_dir))}")
        )
        .start()
    )
    return q, versions


def fresh_dim_enrich_sink(
    events: DataFrame,
    dim_loader,
    out_dir: str,
    join_key: str = "user_id",
) -> StreamingQuery:
    """Stream-static enrichment with a REFRESHABLE dimension: the static
    side is re-LOADED inside foreachBatch, so dimension updates (new
    files, overwrites) are visible to the next micro-batch. The caveat
    this answers: a static DataFrame declared once in the streaming
    plan caches its parquet file listing, so plan-level stream-static
    joins do NOT see new dimension files (pinned in
    tests/test_streaming.py) — fresher than the reference's load-once
    heap cache (EngagementProcessor.scala:147-148) requires this seam
    (or a table format whose snapshot resolves per batch).

    `dim_loader(spark) -> DataFrame` runs once per micro-batch — keep
    it a cheap scan of an always-small dimension (broadcast side)."""

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        dim = dim_loader(batch_df.sparkSession)
        (
            batch_df.join(F.broadcast(dim), join_key, "left")
            .write.mode("append")
            .parquet(out_dir)
        )

    return (
        events.writeStream.outputMode("append")
        .foreachBatch(step)
        .option(
            "checkpointLocation", checkpoint_dir(f"fresh_{abs(hash(out_dir))}")
        )
        .start()
    )


def incremental_drain_sink(
    stream: DataFrame, out_path: str, checkpoint: str
) -> StreamingQuery:
    """Scheduled incremental ingestion: `Trigger.AvailableNow` processes
    everything available at start (rate-limited into multiple
    micro-batches by the source's maxFilesPerTrigger), commits the
    checkpoint, and STOPS. With a stable caller-owned checkpoint, each
    invocation resumes where the last left off — run it from cron and
    you get exactly-once batch-incremental ingestion of a growing
    directory (or topic) with no always-on cluster.

    This is the production complement to the continuous sinks above:
    same plan, same checkpoint format — switching a pipeline between
    continuous and scheduled is ONLY a trigger change. Prefer it over
    `processAllAvailable()` (test-only: blocks an already-running
    continuous query with no termination contract) and over plain batch
    reads of the directory (no offset tracking — reprocesses everything
    every run)."""
    return (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
