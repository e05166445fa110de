"""Example real-connector bodies for the foreachBatch seams.

The sink→table mapping (streaming/sinks.py) keeps Spark-managed tables
as the tested default, with foreachBatch as the seam where a real
external connector attaches. This module shows one such body end to
end: the Redis serving sink, with the reference's exact write protocol —
pipeline-batched HINCRBY per engagement counter, ZINCRBY score updates,
a 900 s EXPIRE on every touched key (EngagementRedisSink.scala:22,
126-158), and delete-and-rebuild of the top-k sorted sets
(EngagementRedisSink.scala:186-197).

The client is injected through a factory, so production passes
`redis.Redis(...)` (same pipeline()/hincrby/zincrby/expire/delete/zadd
surface) and tests pass the dict-backed fake below. The foreachBatch
body consumes the COMPLETE-mode aggregate snapshot — |keys| rows of
serving state, bounded by the key domain, the same single-process
working set the reference sink itself buffers — so the driver-side
iteration is serving-small by construction, never the event stream.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from stream_processing_project_spark.streaming.pipeline import checkpoint_dir

SERVING_TTL_S = 900  # reference TTL (EngagementRedisSink.scala:22)


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
) -> StreamingQuery:
    """K2 with a real connector attached: same complete-mode aggregate
    stream as sinks.serving_topk_sink, foreachBatch body writing Redis
    instead of the parquet snapshot table."""
    return (
        agg_stream.writeStream.outputMode("complete")
        .foreachBatch(make_redis_serving_body(client_factory, k_engagement, k_access))
        .trigger(processingTime=trigger)
        .option("checkpointLocation", checkpoint_dir("redis-serving"))
        .start()
    )
