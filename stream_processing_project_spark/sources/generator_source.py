"""Custom Python DataSource: the reference's event generator as a real
Spark source connector (SURVEY.md §2.1 S4, the idiomatic Spark-4 way).

The reference seeds its pipeline with a standalone Python process that
INSERTs Faker batches into Postgres (generator/generate_data.py:106-128,
:174-186 — batch size / interval knobs drive the offered load). Here the
generator IS a Spark source: `spark.read.format("cdc_events")` for a
bounded corpus, `spark.readStream.format("cdc_events")` for a
rate-limited unbounded stream — no external process, no database hop,
and the offered-load knobs (`rowsPerBatch` = the reference's
BATCH_SIZE) become source options. Offsets are plain row indices, so
streaming restarts resume exactly (the checkpoint stores the index) —
a capability the reference's fire-and-forget generator lacks.

Rows are the SAME pure function of the row index as
sources/synthetic.py (deterministic, engine-reproducible — the DuckDB
oracle regenerates the corpus from range()), so batch, streaming, and
oracle all agree row-for-row.

This is also the template for real custom connectors: implement
partitions() to split the domain, read() to yield one partition's rows
Arrow-batched back to the JVM — the Python DataSource API (SPARK-44076)
handles serialization, scheduling, and exactly-once offset bookkeeping.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from stream_processing_project_spark.sources.synthetic import EPOCH, EVENT_TYPES

SCHEMA = (
    "event_id bigint, user_id bigint, content_id bigint, "
    "event_type string, engagement_seconds double, event_ts string"
)


def _row(i: int) -> tuple:
    """One event as a pure function of its index — MUST stay in lockstep
    with sources/synthetic.synthetic_events (the oracle's formulas)."""
    ts = datetime.fromtimestamp(EPOCH + i, tz=timezone.utc)
    return (
        i,
        (i * 7919) % 997,
        (i * 31) % 5000,
        EVENT_TYPES[i % len(EVENT_TYPES)],
        ((i * 37) % 300000) / 1000.0,
        ts.strftime("%Y-%m-%d %H:%M:%S"),
    )


@dataclass
class _Range(InputPartition):
    start: int
    end: int


class CdcEventsBatchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 10_000))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self) -> list[_Range]:
        """Split the index space evenly — the generation analogue of file
        splits; each partition is independent, so parallelism is free."""
        n, k = self.rows, max(1, self.num_partitions)
        if n <= 0:
            return [_Range(0, 0)]  # empty source still needs one split
        step = -(-n // k)
        return [_Range(s, min(s + step, n)) for s in range(0, n, step)]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield _row(i)


class CdcEventsStreamReader(DataSourceStreamReader):
    """Micro-batch reader: the offset is the next unread row index.
    `rowsPerBatch` caps each micro-batch (the reference's BATCH_SIZE
    offered-load knob, .env:46); `maxRows` bounds the stream (default
    10_000 — set it explicitly for an effectively-unbounded source).
    Restart-safe: Spark checkpoints the committed index and asks for
    exactly the uncovered range; the in-memory cursor fast-forwards to
    any offset the engine has already planned or committed, so a reader
    recreated after a restart can never report an offset BEHIND the
    checkpoint (which would re-emit committed rows and break
    exactly-once)."""

    def __init__(self, options: dict) -> None:
        self.rows_per_batch = int(options.get("rowsPerBatch", 1_000))
        self.max_rows = int(options.get("maxRows", 10_000))
        self.num_partitions = int(options.get("numPartitions", 4))
        self._cur = 0

    def _fast_forward(self, index: int) -> None:
        """Make cursor progression monotonic w.r.t. the engine's known
        position — the restart resume path (offsets the engine replays
        via partitions()/commit() carry the checkpointed index)."""
        self._cur = max(self._cur, index)

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        # One rowsPerBatch step per trigger; a real unbounded source
        # would report how far the upstream has advanced instead.
        nxt = min(self._cur + self.rows_per_batch, self.max_rows)
        self._cur = nxt
        return {"index": nxt}

    def partitions(self, start: dict, end: dict) -> list[_Range]:
        self._fast_forward(end["index"])
        lo, hi = start["index"], end["index"]
        if hi <= lo:
            return [_Range(lo, lo)]
        k = max(1, self.num_partitions)
        step = -(-(hi - lo) // k)
        return [_Range(s, min(s + step, hi)) for s in range(lo, hi, step)]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end: dict) -> None:
        self._fast_forward(end["index"])


class CdcEventsDataSource(DataSource):
    """`spark.dataSource.register(CdcEventsDataSource)` then
    `spark.read.format("cdc_events")...` / `spark.readStream...`."""

    @classmethod
    def name(cls) -> str:
        return "cdc_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> CdcEventsBatchReader:
        return CdcEventsBatchReader(self.options)

    def streamReader(self, schema) -> CdcEventsStreamReader:
        return CdcEventsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CdcEventsDataSource)
