"""S2 kafka-format branch — as far as the sandbox allows (VERDICT r02
"What's missing" #1). No broker and no spark-sql-kafka jar ship in this
container, so coverage splits three ways:

1. option plumbing is a pure function — assert the reference's consumer
   fetch tuning (EngagementProcessor.scala:154-168, .env:14-17) reaches
   the source options verbatim;
2. the decode branch is schema-generic — drive the REAL kafka decode
   (value bytes → envelope parse → drop failures) with a batch frame in
   kafka's wire schema;
3. plan construction through `readStream.format("kafka")` is env-gated:
   it runs fully when the kafka-sql package is on the classpath and
   skips (documented in README S2) at the data-source lookup otherwise.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stream_processing_project_spark.streaming import pipeline
from tests.conftest import SF_SMOKE


def test_kafka_source_options_match_reference_tuning():
    opts = pipeline.kafka_source_options("broker-1:9092,broker-2:9092", "events")
    # connection + subscription
    assert opts["kafka.bootstrap.servers"] == "broker-1:9092,broker-2:9092"
    assert opts["subscribe"] == "events"
    # reference fetch tuning, passed through as kafka.* consumer configs
    assert opts["kafka.fetch.min.bytes"] == str(1024 * 1024)
    assert opts["kafka.fetch.max.wait.ms"] == "500"
    assert opts["kafka.max.partition.fetch.bytes"] == str(2 * 1024 * 1024)
    assert opts["kafka.receive.buffer.bytes"] == str(1024 * 1024)
    assert opts["startingOffsets"] == "earliest"
    assert opts["minPartitions"] == "4"


def test_kafka_decode_runs_on_wire_schema_batch(spark):
    """kafka_decode consumes kafka's wire schema (value binary + broker
    metadata columns) and must yield the SAME typed event shape as
    cdc_event_stream — parse good envelopes, drop bad bytes, filter to
    insert/read ops, project the event-time `ts` column."""
    from stream_processing_project_spark.sources.cdc import to_envelope_json
    from stream_processing_project_spark.sources.fixtures import load_table

    events = load_table(spark, SF_SMOKE, "events").limit(50)
    good = to_envelope_json(events).select(
        F.lit(None).cast("binary").alias("key"),
        F.encode("value", "UTF-8").alias("value"),
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    bad = spark.range(5).select(
        F.lit(None).cast("binary").alias("key"),
        F.encode(F.lit("{not json"), "UTF-8").alias("value"),
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("id").alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    decoded = pipeline.kafka_decode(good.unionByName(bad))
    rows = decoded.collect()
    # bad bytes dropped, u/d ops filtered (event_id % 20 in {0, 1})
    want = {
        r.event_id for r in events.collect() if r.event_id % 20 not in (0, 1)
    }
    assert {r.event_id for r in rows} == want
    assert decoded.columns == [
        "event_id", "user_id", "event_type", "ts", "value", "props",
    ]  # identical shape to cdc_event_stream — downstream consumers work unchanged


def test_kafka_format_plan_construction(spark):
    """End-to-end source construction — runs when spark-sql-kafka is on
    the classpath, skips at the data-source lookup when it is not."""
    try:
        df = pipeline.kafka_event_stream(spark, "localhost:9092", "events")
    except Exception as exc:  # noqa: BLE001
        # gate ONLY on the missing-jar lookup failure — any other
        # construction error (e.g. a dropped required option) must FAIL
        if "Failed to find data source" in str(exc):
            pytest.skip("spark-sql-kafka package not on the classpath (README S2)")
        raise
    assert df.isStreaming
    assert "event_type" in df.columns and "ts" in df.columns
