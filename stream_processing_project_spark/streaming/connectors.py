"""Example real-connector bodies for the foreachBatch seams.

The sink→table mapping (streaming/sinks.py) keeps Spark-managed tables
as the tested default, with foreachBatch as the seam where a real
external connector attaches. This module shows such bodies end
to end, starting with the Redis serving sink. The Redis body ADAPTS the
reference protocol (EngagementRedisSink.scala:22,126-158,186-197) to
Spark's complete-mode snapshots rather than reproducing it verbatim:
the reference accumulates per-flush DELTAS via HINCRBY/ZINCRBY under
per-minute window keys and zadds every content type to its boards; this
body receives cumulative totals each micro-batch, so it delete-and-
rebuilds each key and truncates the boards to top-k client-side. Same
client surface (pipelined HINCRBY/ZINCRBY/ZADD/DELETE + a 900 s EXPIRE
on every touched key), deliberately different write discipline.

The client is injected through a factory, so production passes
`redis.Redis(...)` (same pipeline()/hincrby/zincrby/expire/delete/zadd
surface) and tests pass the dict-backed fake below. The foreachBatch
body consumes the COMPLETE-mode aggregate snapshot — |keys| rows of
serving state, bounded by the key domain, the same single-process
working set the reference sink itself buffers — so the driver-side
iteration is serving-small by construction, never the event stream.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from stream_processing_project_spark.streaming.pipeline import checkpoint_dir

SERVING_TTL_S = 900  # reference TTL (EngagementRedisSink.scala:22)

# Reference batch sizes (BigQuerySink.scala:27, ElasticsearchSink.scala:25)
BQ_BATCH_SIZE = 2000
ES_BATCH_SIZE = 1000
ES_TEMPLATE_NAME = "engagement_events_template"


class FakeRedisPipeline:
    """Command buffer with the redis-py pipeline surface the connector
    uses; execute() applies the batch atomically — the semantics the
    reference gets from Jedis pipelining."""

    def __init__(self, store: "FakeRedisClient") -> None:
        self._store = store
        self._ops: list[tuple[Any, ...]] = []

    def hincrby(self, key: str, field: str, amount: int = 1) -> None:
        self._ops.append(("hincrby", key, field, amount))

    def zincrby(self, key: str, amount: float, member: str) -> None:
        self._ops.append(("zincrby", key, amount, member))

    def zadd(self, key: str, mapping: dict[str, float]) -> None:
        self._ops.append(("zadd", key, dict(mapping)))

    def delete(self, *keys: str) -> None:
        self._ops.append(("delete", *keys))

    def expire(self, key: str, ttl_s: int) -> None:
        self._ops.append(("expire", key, ttl_s))

    def execute(self) -> int:
        n = len(self._ops)
        for op in self._ops:
            self._store._apply(op)
        self._ops.clear()
        return n


class FakeRedisClient:
    """Dict-backed stand-in with the exact client surface the connector
    body calls. hashes: key -> field -> int; zsets: key -> member ->
    score; ttls: key -> seconds (recorded, not enforced — the test
    asserts the EXPIRE calls happened)."""

    def __init__(self) -> None:
        self.hashes: dict[str, dict[str, int]] = {}
        self.zsets: dict[str, dict[str, float]] = {}
        self.ttls: dict[str, int] = {}

    def pipeline(self) -> FakeRedisPipeline:
        return FakeRedisPipeline(self)

    def _apply(self, op: tuple[Any, ...]) -> None:
        name = op[0]
        if name == "hincrby":
            _, key, field, amount = op
            h = self.hashes.setdefault(key, {})
            h[field] = h.get(field, 0) + amount
        elif name == "zincrby":
            _, key, amount, member = op
            z = self.zsets.setdefault(key, {})
            z[member] = z.get(member, 0.0) + amount
        elif name == "zadd":
            _, key, mapping = op
            self.zsets.setdefault(key, {}).update(mapping)
        elif name == "delete":
            for key in op[1:]:
                self.hashes.pop(key, None)
                self.zsets.pop(key, None)
                self.ttls.pop(key, None)
        elif name == "expire":
            _, key, ttl_s = op
            self.ttls[key] = ttl_s


def make_redis_serving_body(
    client_factory: Callable[[], Any],
    k_engagement: int = 3,
    k_access: int = 5,
    ttl_s: int = SERVING_TTL_S,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body writing the complete-mode (key, cnt, sum_val)
    aggregate snapshot to Redis with the reference protocol: one
    pipeline per batch carrying per-key HINCRBY/ZINCRBY + EXPIRE, then
    DELETE + ZADD rebuild of the two top-k boards. Pass
    `redis.Redis(...)` as the factory in production; FakeRedisClient in
    tests."""

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        rows = batch_df.select("key", "cnt", "sum_val").collect()
        client = client_factory()
        pipe = client.pipeline()
        scored = []
        # complete mode RE-STATES cumulative totals every batch, so every
        # structure rebuilds via delete+set — an additive ZINCRBY here
        # would double-count each key's running sum on every micro-batch
        # (the reference's HINCRBY/ZINCRBY accumulate because its source
        # is per-flush DELTAS, EngagementRedisSink.scala:126-158)
        pipe.delete("engagement_sum")
        for r in rows:
            avg = float(r.sum_val) / max(int(r.cnt), 1)
            scored.append((str(r.key), int(r.cnt), avg))
            pipe.delete(f"engagement:{r.key}")
            pipe.hincrby(f"engagement:{r.key}", "access_count", int(r.cnt))
            pipe.zadd("engagement_sum", {str(r.key): float(r.sum_val)})
            pipe.expire(f"engagement:{r.key}", ttl_s)
        pipe.expire("engagement_sum", ttl_s)
        # delete-and-rebuild top-k boards (EngagementRedisSink.scala:186-197)
        top_eng = sorted(scored, key=lambda s: (-s[2], s[0]))[:k_engagement]
        top_acc = sorted(scored, key=lambda s: (-s[1], s[0]))[:k_access]
        pipe.delete("top_by_engagement", "top_by_access")
        if top_eng:
            pipe.zadd("top_by_engagement", {k: avg for k, _, avg in top_eng})
        if top_acc:
            pipe.zadd("top_by_access", {k: float(c) for k, c, _ in top_acc})
        pipe.expire("top_by_engagement", ttl_s)
        pipe.expire("top_by_access", ttl_s)
        pipe.execute()

    return body


def redis_serving_sink(
    agg_stream: DataFrame,
    client_factory: Callable[[], Any],
    k_engagement: int = 3,
    k_access: int = 5,
    trigger: str = "500 milliseconds",
    ttl_s: int = SERVING_TTL_S,
    checkpoint_location: str | None = None,
) -> StreamingQuery:
    """K2 with a real connector attached: same complete-mode aggregate
    stream as sinks.serving_topk_sink, foreachBatch body writing Redis
    instead of the parquet snapshot table.

    `checkpoint_location` defaults to a fresh tempdir; production passes
    a durable path. Recovery is free by construction: the aggregate
    state restores from the checkpoint and the body delete-and-rebuilds
    every key, so a crash between the Redis write and the epoch commit
    replays into an IDENTICAL restatement (pinned in
    tests/test_streaming.py)."""
    return (
        agg_stream.writeStream.outputMode("complete")
        .foreachBatch(
            make_redis_serving_body(client_factory, k_engagement, k_access, ttl_s)
        )
        .trigger(processingTime=trigger)
        .option(
            "checkpointLocation",
            checkpoint_location or checkpoint_dir("redis-serving"),
        )
        .start()
    )


# --- HTTP-shaped warehouse/search bodies (BQ insertAll, ES _bulk) -----------


class FakeHttpSession:
    """HTTP capture double with the one-method surface the connector
    bodies call: request(method, url, body, content_type) -> status.

    Each request is spooled as its own JSON file under `capture_dir`
    rather than held on the instance — the senders run inside
    foreachPartition, i.e. in Python WORKER processes, so in-memory
    capture on a driver-side object would silently record nothing (the
    workers mutate pickled copies). A shared directory is the one
    channel local-mode workers and the test process both see, and it
    doubles as what a capture proxy would log in a real environment.

    `fail_pattern` (substring match) makes matching URLs return 503 —
    deterministic across worker copies because it's constructor state,
    not a mutable call counter. Production passes a requests.Session
    adapter with the same signature instead.
    """

    def __init__(self, capture_dir: str, fail_pattern: str | None = None) -> None:
        self.capture_dir = capture_dir
        self.fail_pattern = fail_pattern

    def request(
        self,
        method: str,
        url: str,
        body: str,
        content_type: str = "application/json",
    ) -> int:
        status = 503 if (self.fail_pattern and self.fail_pattern in url) else 200
        rec = {
            "method": method,
            "url": url,
            "content_type": content_type,
            "status": status,
            "body": body,
        }
        os.makedirs(self.captures_path(), exist_ok=True)
        name = uuid.uuid4().hex
        tmp = os.path.join(self.captures_path(), f"{name}.tmp")
        with open(tmp, "w") as f:
            json.dump(rec, f)
        # write-then-rename so captured() never reads a half-written file
        os.rename(tmp, os.path.join(self.captures_path(), f"{name}.json"))
        return status

    def captures_path(self) -> str:
        return os.path.join(self.capture_dir, "requests")

    def captured(self) -> list[dict]:
        path = self.captures_path()
        if not os.path.isdir(path):
            return []
        out = []
        for name in sorted(os.listdir(path)):
            if name.endswith(".json"):
                with open(os.path.join(path, name)) as f:
                    out.append(json.load(f))
        return out


def _flush_chunk(
    http: Any,
    url: str,
    payload: str,
    content_type: str,
    fallback_lines: list[str],
    fallback_dir: str,
    tag: str,
    epoch_id: int,
    chunk_idx: int,
) -> None:
    """POST one batch; on non-2xx or transport error, spool the batch's
    documents as a JSONL fallback file (BigQuerySink.scala:221-240,
    ElasticsearchSink.scala:284-303). The file name is DETERMINISTIC in
    (epoch, partition, chunk index), so a task retry or a foreachBatch
    epoch replay OVERWRITES its own earlier spool instead of appending
    a duplicate — write-to-temp + rename keeps a reader from seeing a
    half-written file. (HTTP-side retry duplication is inherent to the
    reference's insertAll-without-insertId protocol; at-least-once
    there, exactly-once on the fallback files.)"""
    try:
        status = http.request("POST", url, payload, content_type)
        ok = 200 <= status < 300
    except Exception:
        ok = False
    if not ok:
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        os.makedirs(fallback_dir, exist_ok=True)
        name = f"{tag}_batch_{epoch_id}_p{pid}_c{chunk_idx}.jsonl"
        tmp = os.path.join(fallback_dir, f".{name}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            for line in fallback_lines:
                f.write(line)
                f.write("\n")
        os.replace(tmp, os.path.join(fallback_dir, name))


def _bq_row_json(df: DataFrame) -> DataFrame:
    """Per-row insertAll row object, serialized JVM-side: the Python
    sender only concatenates strings. Mirrors the reference row shape
    (BigQuerySink.scala:154-172) on our enriched-event columns, with
    the same 'yyyy-MM-dd HH:mm:ss' second-truncated timestamps."""
    return df.select(
        F.to_json(
            F.struct(
                F.col("event_id").alias("id"),
                F.col("user_id"),
                F.col("event_type"),
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
                F.col("value"),
                F.col("segment"),
                F.col("engagement_pct"),
                F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss").alias(
                    "processing_time"
                ),
            )
        ).alias("doc")
    )


def make_bigquery_warehouse_body(
    http_factory: Callable[[], Any],
    project: str,
    dataset: str,
    table: str,
    base_url: str = "http://bigquery-emulator:9050",
    batch_size: int = BQ_BATCH_SIZE,
    fallback_dir: str = "/tmp/bq_fallback",
) -> Callable[[DataFrame, int], None]:
    """K3 with an insertAll-shaped HTTP body: per micro-batch, each
    PARTITION serializes its rows JVM-side, wraps them into the
    reference's insertAll payload {"rows": [{"json": {...}}, ...]} in
    batch_size chunks (BigQuerySink.scala:145-152,27), POSTs to
    /projects/{p}/datasets/{d}/tables/{t}/insertAll
    (BigQuerySink.scala:190), and spools any failed chunk to a JSONL
    fallback file (BigQuerySink.scala:221-240).

    Deliberate adaptations from the reference buffer: flushing is
    per-partition inside the micro-batch (executor-side HTTP, no
    driver-side collect of an event-sized stream, no cross-batch
    buffer), there is no MAX_BUFFER_SIZE overflow DROP
    (BigQuerySink.scala:65-67 silently discards; Spark's trigger
    backpressure replaces it), and the timer flush is the micro-batch
    trigger itself."""
    url = f"{base_url}/projects/{project}/datasets/{dataset}/tables/{table}/insertAll"

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        docs = _bq_row_json(batch_df)

        def send(rows: Iterable) -> None:
            http = http_factory()
            n_flushed = 0

            def flush(chunk: list[str]) -> None:
                nonlocal n_flushed
                payload = (
                    '{"rows": ['
                    + ", ".join('{"json": ' + d + "}" for d in chunk)
                    + "]}"
                )
                _flush_chunk(
                    http, url, payload, "application/json",
                    chunk, fallback_dir, "bigquery", epoch_id, n_flushed,
                )
                n_flushed += 1

            chunk: list[str] = []
            for r in rows:
                chunk.append(r.doc)
                if len(chunk) >= batch_size:
                    flush(chunk)
                    chunk = []
            if chunk:
                flush(chunk)

        docs.foreachPartition(send)

    return body


def bigquery_warehouse_sink(
    enriched: DataFrame,
    http_factory: Callable[[], Any],
    project: str = "local-project",
    dataset: str = "analytics",
    table: str = "engagement_events",
    base_url: str = "http://bigquery-emulator:9050",
    batch_size: int = BQ_BATCH_SIZE,
    fallback_dir: str = "/tmp/bq_fallback",
    trigger: str = "8 seconds",
    checkpoint_location: str | None = None,
) -> StreamingQuery:
    """K3 with the real connector body attached: same enriched append
    stream as sinks.warehouse_sink, foreachBatch POSTing insertAll
    payloads instead of writing the parquet table.

    `checkpoint_location` defaults to a FRESH tempdir (fine for tests
    and ad-hoc replays); production MUST pass a durable path — the
    checkpoint is what makes an endpoint outage or a driver crash
    resumable without re-delivering committed epochs (see
    tests/test_connectors_http.py crash-recovery test)."""
    return (
        enriched.writeStream.outputMode("append")
        .foreachBatch(
            make_bigquery_warehouse_body(
                http_factory, project, dataset, table,
                base_url, batch_size, fallback_dir,
            )
        )
        .trigger(processingTime=trigger)
        .option(
            "checkpointLocation",
            checkpoint_location or checkpoint_dir("bq-warehouse"),
        )
        .start()
    )


def es_index_template(
    index_name: str, shards: int = 1, replicas: int = 0
) -> str:
    """The reference's index template for engagement-events-* daily
    indices (ElasticsearchSink.scala:95-118): keyword/date/long/float
    mapping + shard/replica settings, PUT once at startup."""
    return json.dumps(
        {
            "index_patterns": [f"{index_name}-*"],
            "template": {
                "settings": {
                    "number_of_shards": shards,
                    "number_of_replicas": replicas,
                },
                "mappings": {
                    "properties": {
                        "id": {"type": "long"},
                        "user_id": {"type": "keyword"},
                        "event_type": {"type": "keyword"},
                        "event_timestamp": {"type": "date"},
                        "segment": {"type": "keyword"},
                        "value": {"type": "float"},
                        "engagement_pct": {"type": "float"},
                        "@timestamp": {"type": "date"},
                    }
                },
            },
        }
    )


def _es_doc_json(df: DataFrame, index_name: str) -> DataFrame:
    """(daily index name, document) pairs, serialized JVM-side. The
    daily index derives from EVENT date — deterministic and
    late-data-correct, vs the reference's wall-clock today
    (ElasticsearchSink.scala:184-185), which files late events in the
    wrong day's index; same deliberate divergence as the table sink's
    event_date partitioning (sinks.search_sink)."""
    return df.select(
        F.concat(
            F.lit(index_name + "-"), F.date_format("ts", "yyyy-MM-dd")
        ).alias("idx"),
        F.to_json(
            F.struct(
                F.col("event_id").alias("id"),
                F.col("user_id"),
                F.col("event_type"),
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
                    "event_timestamp"
                ),
                F.col("value"),
                F.col("segment"),
                F.col("engagement_pct"),
                F.date_format(
                    F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss'Z'"
                ).alias("@timestamp"),
            )
        ).alias("doc"),
    )


def make_es_search_body(
    http_factory: Callable[[], Any],
    index_name: str = "engagement-events",
    base_url: str = "http://elasticsearch:9200",
    batch_size: int = ES_BATCH_SIZE,
    fallback_dir: str = "/tmp/es_fallback",
) -> Callable[[DataFrame, int], None]:
    """K4 with a _bulk NDJSON body: per partition, rows become
    action/document line pairs — {"index":{"_index":"<name>-<day>"}}
    then the document (ElasticsearchSink.scala:202-209) — POSTed to
    /_bulk as application/x-ndjson in batch_size chunks
    (ElasticsearchSink.scala:247-256,25); failed chunks spool document
    JSONL fallback files (ElasticsearchSink.scala:284-303). Per-action
    _index routing means one bulk request can span days — no grouping
    shuffle needed."""
    url = f"{base_url}/_bulk"

    def body(batch_df: DataFrame, epoch_id: int) -> None:
        docs = _es_doc_json(batch_df, index_name)

        def send(rows: Iterable) -> None:
            http = http_factory()
            n_flushed = 0

            def flush(chunk: list[tuple[str, str]]) -> None:
                nonlocal n_flushed
                lines = []
                for idx, doc in chunk:
                    lines.append(json.dumps({"index": {"_index": idx}}))
                    lines.append(doc)
                payload = "\n".join(lines) + "\n"
                _flush_chunk(
                    http, url, payload, "application/x-ndjson",
                    [d for _, d in chunk], fallback_dir, "elasticsearch",
                    epoch_id, n_flushed,
                )
                n_flushed += 1

            chunk: list[tuple[str, str]] = []
            for r in rows:
                chunk.append((r.idx, r.doc))
                if len(chunk) >= batch_size:
                    flush(chunk)
                    chunk = []
            if chunk:
                flush(chunk)

        docs.foreachPartition(send)

    return body


def es_search_sink(
    enriched: DataFrame,
    http_factory: Callable[[], Any],
    index_name: str = "engagement-events",
    base_url: str = "http://elasticsearch:9200",
    batch_size: int = ES_BATCH_SIZE,
    fallback_dir: str = "/tmp/es_fallback",
    trigger: str = "5 seconds",
    shards: int = 1,
    replicas: int = 0,
    checkpoint_location: str | None = None,
) -> StreamingQuery:
    """K4 with the real connector body attached: PUTs the index
    template once at startup (ElasticsearchSink.scala:86-137,
    driver-side — a one-time idempotent call), then streams _bulk
    batches."""
    status = http_factory().request(
        "PUT",
        f"{base_url}/_index_template/{ES_TEMPLATE_NAME}",
        es_index_template(index_name, shards, replicas),
        "application/json",
    )
    if not 200 <= status < 300:
        # fail fast: streaming into auto-created dynamic mappings
        # silently corrupts the search surface (dates inferred as
        # text), which is worse than a startup error — a deliberate
        # divergence from the reference's log-and-continue
        # (ElasticsearchSink.scala:125-135)
        raise RuntimeError(
            f"index template PUT failed with status {status}; refusing "
            "to stream into dynamic mappings"
        )
    return (
        enriched.writeStream.outputMode("append")
        .foreachBatch(
            make_es_search_body(
                http_factory, index_name, base_url, batch_size, fallback_dir
            )
        )
        .trigger(processingTime=trigger)
        .option(
            "checkpointLocation",
            checkpoint_location or checkpoint_dir("es-search"),
        )
        .start()
    )
