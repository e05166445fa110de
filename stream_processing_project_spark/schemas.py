"""Central schema registry.

The reference declares each schema up to four times by convention
(Postgres DDL postgresql/init.sql:2-21, Scala case classes
models/Events.scala:8-59, BigQuery DDL run.sh:164-177, ES mapping
ElasticsearchSink.scala:103-115) with no single source of truth
(SURVEY.md §1.2). Here every table has exactly one StructType.

Two families:
  1. Reference-shaped tables (content / engagement_events / CDC envelope /
     enriched_events) used by the streaming pipeline and parity tests.
  2. Driver fixture tables (/root/testdata/sf*/...) used by the batch
     query suite — `events` plays `engagement_events`, `customer` plays
     the `content` dimension (FIXTURES.md §6).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# 1. Reference-shaped schemas
# ---------------------------------------------------------------------------

# content dimension — postgresql/init.sql:2-9 (UUIDs carried as strings,
# EngagementProcessor.scala:84 casts id::text on load).
CONTENT = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("slug", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("length_seconds", T.IntegerType(), True),
        T.StructField("publish_ts", T.TimestampType(), True),
    ]
)

# engagement_events fact — postgresql/init.sql:12-21.
ENGAGEMENT_EVENTS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("content_id", T.StringType(), True),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("event_ts", T.TimestampType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("device", T.StringType(), True),
        T.StructField("raw_payload", T.StringType(), True),
    ]
)

# Debezium ExtractNewRecordState envelope — debezium/postgres-connector.json:16-20,
# models/Events.scala:19-38. event_ts is a STRING in flight (the reference
# re-parses it per sink, BigQuerySink.scala:174-186); we parse once.
CDC_PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("content_id", T.StringType(), True),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("event_ts", T.StringType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("device", T.StringType(), True),
        T.StructField("raw_payload", T.StringType(), True),
        T.StructField("__op", T.StringType(), True),
        T.StructField("__table", T.StringType(), True),
        T.StructField("__db", T.StringType(), True),
        T.StructField("__ts_ms", T.LongType(), True),
    ]
)

CDC_ENVELOPE = T.StructType([T.StructField("payload", CDC_PAYLOAD, True)])

# raw_payload JSONB object — generator/generate_data.py:123-127.
RAW_PAYLOAD = T.StructType(
    [
        T.StructField("session_id", T.StringType(), True),
        T.StructField("ip", T.StringType(), True),
        T.StructField("user_agent", T.StringType(), True),
    ]
)

# enriched_events — models/Events.scala:46-59 + derivations
# EngagementProcessor.scala:104-135 (FIXTURES.md §4).
ENRICHED_EVENTS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("content_id", T.StringType(), True),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("event_ts", T.TimestampType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("device", T.StringType(), True),
        T.StructField("raw_payload", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("length_seconds", T.IntegerType(), True),
        T.StructField("engagement_seconds", T.DoubleType(), True),
        T.StructField("engagement_pct", T.DoubleType(), True),
        T.StructField("processing_time", T.TimestampType(), True),
    ]
)

# Categorical domains — generator/generate_data.py:18-24 (SURVEY.md §1.4).
CONTENT_TYPES = [
    "podcast", "newsletter", "video", "webinar", "course", "article",
    "ebook", "whitepaper", "case-study", "tutorial", "demo", "interview",
    "documentary", "livestream", "audiobook", "blog-post",
]
EVENT_TYPES = ["play", "pause", "finish", "click"]
DEVICES = ["ios", "android", "web-chrome", "web-safari", "web-firefox"]

# ---------------------------------------------------------------------------
# 2. Driver fixture tables (/root/testdata/sf*/<name>.parquet)
# ---------------------------------------------------------------------------

FIXTURE_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),  # opaque JSON, like raw_payload
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)
