"""Reference-semantics parity tests (SURVEY.md §5): the behaviors the
reference implements in Scala, pinned against hand-computed expectations.
Citations: flink-scala/src/main/scala/com/streaming/EngagementProcessor.scala.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from stream_processing_project_spark.operators.enrich import enrich_engagement
from stream_processing_project_spark.schemas import CONTENT, ENGAGEMENT_EVENTS


def _events(spark, rows):
    base = {
        "id": 1,
        "content_id": "c1",
        "user_id": "u1",
        "event_type": "play",
        "event_ts": datetime.datetime(2024, 1, 1, 0, 0, 0),
        "duration_ms": 30000,
        "device": "ios",
        "raw_payload": "{}",
        "__op": "c",
    }
    data = [Row(**{**base, **r}) for r in rows]
    return spark.createDataFrame(data)


def _content(spark, rows):
    return spark.createDataFrame(rows, CONTENT)


def test_engagement_pct_rounding_half_up(spark):
    """P5 — Math.round(x*100)/100.0 is HALF_UP at 2dp
    (EngagementProcessor.scala:111-116). Spark round() is also HALF_UP."""
    events = _events(
        spark,
        [
            {"id": 1, "duration_ms": 1150, "content_id": "c1"},  # 1.15s/200s = 0.575%
            {"id": 2, "duration_ms": 1000, "content_id": "c1"},  # 0.5%
        ],
    )
    content = _content(
        spark, [("c1", "s", "t", "video", 200, datetime.datetime(2024, 1, 1))]
    )
    out = {r["id"]: r["engagement_pct"] for r in enrich_engagement(events, content).collect()}
    assert out[1] == 0.58  # HALF_UP, matches Math.round semantics
    assert out[2] == 0.5


def test_engagement_pct_null_semantics(spark):
    """P5 — NULL if duration NULL, length NULL, or length <= 0
    (EngagementProcessor.scala:111-116); P4 null-propagates."""
    events = _events(
        spark,
        [
            {"id": 1, "duration_ms": None, "content_id": "c1"},
            {"id": 2, "duration_ms": 5000, "content_id": "c_null_len"},
            {"id": 3, "duration_ms": 5000, "content_id": "c_zero_len"},
            {"id": 4, "duration_ms": 5000, "content_id": "missing"},
        ],
    )
    content = _content(
        spark,
        [
            ("c1", "s", "t", "video", 100, datetime.datetime(2024, 1, 1)),
            ("c_null_len", "s", "t", "newsletter", None, datetime.datetime(2024, 1, 1)),
            ("c_zero_len", "s", "t", "video", 0, datetime.datetime(2024, 1, 1)),
        ],
    )
    rows = {r["id"]: r for r in enrich_engagement(events, content).collect()}
    assert rows[1]["engagement_pct"] is None and rows[1]["engagement_seconds"] is None
    assert rows[2]["engagement_pct"] is None
    assert rows[3]["engagement_pct"] is None
    # J1 left-outer: missing content id keeps the event with NULL dims
    assert rows[4]["content_type"] is None and rows[4]["engagement_pct"] is None
    assert rows[2]["engagement_seconds"] == 5.0


def test_op_filter_drops_updates_deletes(spark):
    """P2 — only __op in {r, c} survives (EngagementProcessor.scala:107)."""
    events = _events(
        spark,
        [
            {"id": 1, "__op": "c"},
            {"id": 2, "__op": "r"},
            {"id": 3, "__op": "u"},
            {"id": 4, "__op": "d"},
        ],
    )
    content = _content(spark, [])
    assert sorted(
        r["id"] for r in enrich_engagement(events, content).collect()
    ) == [1, 2]


def test_enrichment_is_broadcast_no_fact_shuffle(spark):
    """Scale property: the enrichment join must broadcast the dimension —
    the fact side never shuffles (reference replicates its dim cache to
    every task, EngagementProcessor.scala:72-99; we keep that plan shape)."""
    events = _events(spark, [{"id": 1}])
    content = _content(
        spark, [("c1", "s", "t", "video", 100, datetime.datetime(2024, 1, 1))]
    )
    plan = enrich_engagement(events, content)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_reference_shaped_envelope_parses(spark):
    """S1/P1 against the REFERENCE's exact wire shape: a Debezium
    ExtractNewRecordState message (flattened row + __op/__table/__db/
    __ts_ms, debezium/postgres-connector.json:16-20) parses into the
    canonical CDC schema, and the opaque raw_payload JSONB yields its
    session fields (generate_data.py:123-127)."""
    import json

    from pyspark.sql import functions as F

    from stream_processing_project_spark.schemas import RAW_PAYLOAD
    from stream_processing_project_spark.sources.cdc import parse_reference_envelope

    msg = {
        "payload": {
            "id": 42,
            "content_id": "3f1c0a9e-0000-0000-0000-00000000abcd",
            "user_id": "9e8d7c6b-0000-0000-0000-0000000012ef",
            "event_type": "play",
            "event_ts": "2025-07-25T12:34:56Z",
            "duration_ms": 93000,
            "device": "web-chrome",
            "raw_payload": json.dumps(
                {"session_id": "s-1", "ip": "10.0.0.1", "user_agent": "UA"}
            ),
            "__op": "c",
            "__table": "engagement_events",
            "__db": "streaming_db",
            "__ts_ms": 175344700000,
            "ignored_extra_field": "must not break the parse",
        }
    }
    raw = spark.createDataFrame([(json.dumps(msg),)], ["value"])
    row = (
        parse_reference_envelope(raw)
        .withColumn("rp", F.from_json("raw_payload", RAW_PAYLOAD))
        .collect()[0]
    )
    assert row["id"] == 42
    assert row["event_type"] == "play"
    assert row["duration_ms"] == 93000
    assert row["__op"] == "c"
    assert row["__table"] == "engagement_events"
    assert row["rp"]["session_id"] == "s-1"  # JSONB → typed struct


def test_reference_wire_to_metrics_end_to_end(spark):
    """The reference's whole per-record path on its own wire shape:
    Debezium envelope JSON → parse → op-filter → broadcast left-outer
    enrich → engagement_seconds/pct (EngagementProcessor.scala:104-135).
    93 000 ms over 600 s content → 15.5 %; unknown content id keeps NULL
    dims (left-outer); the 'd' row is dropped by the op filter."""
    import json

    from pyspark.sql import functions as F

    from stream_processing_project_spark.operators.enrich import enrich_engagement
    from stream_processing_project_spark.sources.cdc import parse_reference_envelope

    def msg(mid, cid, op):
        return json.dumps(
            {
                "payload": {
                    "id": mid, "content_id": cid, "user_id": "u-1",
                    "event_type": "play", "event_ts": "2025-07-25T12:00:00Z",
                    "duration_ms": 93000, "device": "ios",
                    "raw_payload": "{}", "__op": op,
                    "__table": "engagement_events", "__db": "db",
                    "__ts_ms": 1,
                }
            }
        )

    raw = spark.createDataFrame(
        [(msg(1, "c-known", "c"),), (msg(2, "c-missing", "r"),), (msg(3, "c-known", "d"),)],
        ["value"],
    )
    content = spark.createDataFrame(
        [("c-known", "podcast", 600)], ["id", "content_type", "length_seconds"]
    )
    rows = {
        r["id"]: r
        for r in enrich_engagement(parse_reference_envelope(raw), content).collect()
    }
    assert set(rows) == {1, 2}  # delete dropped by op-filter
    assert rows[1]["content_type"] == "podcast"
    assert rows[1]["engagement_seconds"] == 93.0
    assert rows[1]["engagement_pct"] == 15.5  # round(93/600*100, 2)
    assert rows[2]["content_type"] is None  # left-outer keeps the event
    assert rows[2]["engagement_pct"] is None


def test_chunk_documents_coverage(spark):
    """Every token lands in >=1 chunk; consecutive chunks overlap by
    exactly chunk-stride tokens; no chunk is fully contained in the
    previous one; reassembling stride-aligned prefixes rebuilds the doc."""
    from stream_processing_project_spark.operators.text import chunk_documents

    texts = {
        0: " ".join(f"t{i}" for i in range(70)),  # 3 chunks, short tail
        1: " ".join(f"t{i}" for i in range(32)),  # exactly one chunk
        2: " ".join(f"t{i}" for i in range(8)),   # shorter than overlap
        3: " ".join(f"t{i}" for i in range(33)),  # 1 token past a chunk
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    chunks = {}
    for r in chunk_documents(df).collect():
        chunks.setdefault(r.doc_id, []).append(r)
    for doc_id, text in texts.items():
        toks = text.split(" ")
        rows = sorted(chunks[doc_id], key=lambda r: r.chunk_start)
        # starts advance by exactly the stride, from zero
        assert [r.chunk_start for r in rows] == [24 * i for i in range(len(rows))]
        # each chunk is the right slice of the source
        for r in rows:
            assert r.chunk_text.split(" ") == toks[r.chunk_start : r.chunk_start + 32]
            assert r.n_chunk_tokens == len(toks[r.chunk_start : r.chunk_start + 32])
        # full coverage: last chunk reaches the end of the doc
        assert rows[-1].chunk_start + rows[-1].n_chunk_tokens == len(toks)
        # no chunk adds zero new tokens
        for prev, cur in zip(rows, rows[1:]):
            assert cur.chunk_start + cur.n_chunk_tokens > prev.chunk_start + 32


def test_repetition_features_planted(spark):
    """A maximally repetitive doc scores dup_word_frac→1 and high
    top-bigram fraction (dropped by the keep flag); an all-distinct doc
    scores 0 and survives."""
    from stream_processing_project_spark.operators.text import repetition_features

    df = spark.createDataFrame(
        [
            (0, "spam " * 19 + "spam"),          # 20x same token
            (1, " ".join(f"w{i}" for i in range(20))),  # all distinct
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in repetition_features(df).collect()}
    assert got[0].dup_word_frac == 19 / 20
    assert got[0].top_bigram_count == 19  # "spam spam" x19
    assert got[0].repetition_keep == 0
    assert got[1].dup_word_frac == 0.0
    assert got[1].top_bigram_count == 1
    assert got[1].repetition_keep == 1
