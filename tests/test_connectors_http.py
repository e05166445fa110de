"""HTTP-shaped connector bodies for the warehouse/search seams
(VERDICT r03 task 2): the BigQuery insertAll body and the
Elasticsearch _bulk body must deliver, through the injectable fake
HTTP session, exactly the rows the corresponding table sinks
materialize — and spool complete JSONL fallback files when the
endpoint fails (BigQuerySink.scala:221-240,
ElasticsearchSink.scala:284-303).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from stream_processing_project_spark.sources.fixtures import load_table
from stream_processing_project_spark.streaming import pipeline, sinks
from stream_processing_project_spark.streaming.connectors import (
    ES_TEMPLATE_NAME,
    FakeHttpSession,
    bigquery_warehouse_sink,
    es_search_sink,
)
from tests.conftest import SF_SMOKE, spool_df


def _enriched(spark):
    return pipeline.enriched_stream(
        pipeline.file_event_stream(spark, SF_SMOKE),
        load_table(spark, SF_SMOKE, "customer"),
    )


def _expected_rows(spark, ts_fmt: str):
    """The same enriched rows, batch-side, keyed for comparison."""
    batch = pipeline.enriched_stream(
        load_table(spark, SF_SMOKE, "events").select(
            F.col("event_id"), "user_id", "event_type", "ts", "value", "props"
        ),
        load_table(spark, SF_SMOKE, "customer"),
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", ts_fmt).alias("ets"),
        "value",
        "segment",
        "engagement_pct",
    )
    return sorted(
        (
            r.event_id,
            r.user_id,
            r.event_type,
            r.ets,
            round(float(r.value), 9),
            r.segment,
            None if r.engagement_pct is None else round(float(r.engagement_pct), 9),
        )
        for r in batch.collect()
    )


def _doc_key(d: dict, ts_field: str):
    return (
        d["id"],
        d["user_id"],
        d["event_type"],
        d[ts_field],
        round(float(d["value"]), 9),
        d.get("segment"),
        None
        if d.get("engagement_pct") is None
        else round(float(d["engagement_pct"]), 9),
    )


def test_bq_insertall_body_matches_table_sink(spark):
    """Success path: every enriched event arrives exactly once across
    the captured insertAll payloads, in the reference's row shape, in
    chunks of at most batch_size."""
    cap = tempfile.mkdtemp(prefix="t-bq-cap-")
    fake = FakeHttpSession(cap)
    q = bigquery_warehouse_sink(
        _enriched(spark),
        lambda: FakeHttpSession(cap),
        project="p1",
        dataset="d1",
        table="t1",
        base_url="http://emu:9050",
        batch_size=100,  # force multiple chunks from the fixture's 1000 events
        fallback_dir=os.path.join(cap, "fallback"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    reqs = fake.captured()
    assert reqs, "no insertAll requests captured"
    got = []
    for r in reqs:
        assert r["method"] == "POST"
        assert r["url"] == "http://emu:9050/projects/p1/datasets/d1/tables/t1/insertAll"
        assert r["content_type"] == "application/json"
        rows = json.loads(r["body"])["rows"]
        assert 0 < len(rows) <= 100
        got += [_doc_key(row["json"], "event_ts") for row in rows]
    assert sorted(got) == _expected_rows(spark, "yyyy-MM-dd HH:mm:ss")
    # rows also carry the processing-time stamp (BigQuerySink.scala:169)
    first = json.loads(reqs[0]["body"])["rows"][0]["json"]
    assert "processing_time" in first
    assert not os.path.isdir(os.path.join(cap, "fallback"))


def test_bq_fallback_jsonl_on_http_failure(spark):
    """Failure path: a 503-returning endpoint must spool every event to
    JSONL fallback files — nothing dropped (the reference's file-based
    batching fallback)."""
    cap = tempfile.mkdtemp(prefix="t-bq-fail-")
    fb = os.path.join(cap, "fallback")
    q = bigquery_warehouse_sink(
        _enriched(spark),
        lambda: FakeHttpSession(cap, fail_pattern="insertAll"),
        batch_size=100,
        base_url="http://emu:9050",
        fallback_dir=fb,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = []
    for name in os.listdir(fb):
        assert name.startswith("bigquery_batch_") and name.endswith(".jsonl")
        with open(os.path.join(fb, name)) as f:
            got += [_doc_key(json.loads(line), "event_ts") for line in f]
    assert sorted(got) == _expected_rows(spark, "yyyy-MM-dd HH:mm:ss")


def test_es_bulk_body_daily_indices_and_template(spark):
    """ES success path: index template PUT at startup with the
    reference mapping, then _bulk NDJSON action/document pairs routed
    to event-date daily indices, matching the table sink's rows."""
    cap = tempfile.mkdtemp(prefix="t-es-cap-")
    fake = FakeHttpSession(cap)
    q = es_search_sink(
        _enriched(spark),
        lambda: FakeHttpSession(cap),
        index_name="engagement-events",
        base_url="http://es:9200",
        batch_size=100,
        fallback_dir=os.path.join(cap, "fallback"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    reqs = fake.captured()
    template = [r for r in reqs if r["method"] == "PUT"]
    assert len(template) == 1
    assert template[0]["url"] == f"http://es:9200/_index_template/{ES_TEMPLATE_NAME}"
    tpl = json.loads(template[0]["body"])
    assert tpl["index_patterns"] == ["engagement-events-*"]
    props = tpl["template"]["mappings"]["properties"]
    assert props["event_timestamp"] == {"type": "date"}
    assert props["user_id"] == {"type": "keyword"}
    assert tpl["template"]["settings"]["number_of_shards"] == 1

    got = []
    for r in reqs:
        if r["method"] != "POST":
            continue
        assert r["url"] == "http://es:9200/_bulk"
        assert r["content_type"] == "application/x-ndjson"
        assert r["body"].endswith("\n")
        lines = r["body"].rstrip("\n").split("\n")
        assert len(lines) % 2 == 0
        for action_s, doc_s in zip(lines[::2], lines[1::2]):
            action = json.loads(action_s)
            doc = json.loads(doc_s)
            # daily index derives from the document's own event date
            day = doc["event_timestamp"][:10]
            assert action == {"index": {"_index": f"engagement-events-{day}"}}
            assert "@timestamp" in doc
            got.append(_doc_key(doc, "event_timestamp"))
    assert sorted(got) == _expected_rows(spark, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def test_es_fallback_jsonl_on_http_failure(spark):
    """ES failure path: _bulk 503 → document JSONL fallback carries
    every event; the template PUT (different URL) still succeeds."""
    cap = tempfile.mkdtemp(prefix="t-es-fail-")
    fb = os.path.join(cap, "fallback")
    fake = FakeHttpSession(cap, fail_pattern="_bulk")
    q = es_search_sink(
        _enriched(spark),
        lambda: FakeHttpSession(cap, fail_pattern="_bulk"),
        base_url="http://es:9200",
        batch_size=100,
        fallback_dir=fb,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert [r["status"] for r in fake.captured() if r["method"] == "PUT"] == [200]
    got = []
    for name in os.listdir(fb):
        assert name.startswith("elasticsearch_batch_") and name.endswith(".jsonl")
        with open(os.path.join(fb, name)) as f:
            got += [_doc_key(json.loads(line), "event_timestamp") for line in f]
    assert sorted(got) == _expected_rows(spark, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def test_es_template_failure_fails_fast(spark):
    """A failed index-template PUT must refuse to start the stream —
    silently proceeding would index into auto-created dynamic mappings
    (a deliberate divergence from the reference's log-and-continue)."""
    import pytest

    cap = tempfile.mkdtemp(prefix="t-es-tpl-")
    with pytest.raises(RuntimeError, match="index template"):
        es_search_sink(
            _enriched(spark),
            lambda: FakeHttpSession(cap, fail_pattern="_index_template"),
            base_url="http://es:9200",
        )


def _crash_recovery_scenario(spark, make_query, capture, tag, ts_field, ts_fmt):
    """Shared crash/recovery drive (VERDICT r05 task 6): three epochs of
    events through a REAL restartable checkpoint.

      epoch 0 (A): endpoint DOWN → rows spool to fallback; the driver
        then CRASHES before the epoch commits (body raises after
        delivery — the worst spot: side effects done, commit lost).
      restart, endpoint still down, epoch 0 REPLAYS + epoch 1 (B):
        the replayed spool OVERWRITES its earlier files (deterministic
        (epoch, partition, chunk) names), B spools alongside — A+B
        exactly once in fallback, zero duplicates from the replay.
      restart, endpoint UP, epoch 2 (C): delivered over HTTP only.

    Final invariant: HTTP store (status-200 bodies) + fallback files
    together equal the batch table rows EXACTLY once. The reference
    silently DROPS on buffer overflow (BigQuerySink.scala:65-67);
    surviving a mid-epoch driver crash with nothing lost and nothing
    doubled is the strictly-better delivery this seam exists for."""
    import pytest

    from stream_processing_project_spark.streaming.pipeline import EVENTS_RAW

    src = tempfile.mkdtemp(prefix=f"t-{tag}-crash-src-")
    ckpt = tempfile.mkdtemp(prefix=f"t-{tag}-crash-ckpt-")
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    ids = {}
    for part, name in ((0, "a"), (1, "b"), (2, "c")):
        sub = ev.filter(F.col("event_id") % 3 == part)
        ids[name] = {r.event_id for r in sub.select("event_id").collect()}

    def append_part(part):
        spool_df(src, ev.filter(F.col("event_id") % 3 == part))

    def enriched():
        stream = (
            spark.readStream.schema(EVENTS_RAW)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        return pipeline.enriched_stream(
            stream, load_table(spark, SF_SMOKE, "customer")
        )

    # --- epoch 0: endpoint down, driver crashes after delivery ----------
    append_part(0)
    q = make_query(enriched(), ckpt, crash=True)
    with pytest.raises(Exception):
        q.processAllAvailable()
    q.stop()

    def fallback_keys(fb):
        got = []
        for name in sorted(os.listdir(fb)) if os.path.isdir(fb) else []:
            with open(os.path.join(fb, name)) as f:
                got += [_doc_key(json.loads(line), ts_field) for line in f]
        return got

    full = _expected_rows(spark, ts_fmt)
    expect_a = [k for k in full if k[0] in ids["a"]]
    fb = capture["fallback"]
    assert sorted(fallback_keys(fb)) == expect_a  # spooled before the crash

    # --- restart from the SAME checkpoint: epoch 0 replays, epoch 1 (B) -
    append_part(1)
    q = make_query(enriched(), ckpt, crash=False)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    expect_ab = [k for k in full if k[0] in ids["a"] | ids["b"]]
    # the replayed epoch OVERWROTE its spool — exactly once, no doubles
    assert sorted(fallback_keys(fb)) == expect_ab

    # --- endpoint recovers: epoch 2 (C) goes over HTTP only -------------
    with open(capture["up_flag"], "w") as f:
        f.write("up")
    append_part(2)
    q = make_query(enriched(), ckpt, crash=False)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(fallback_keys(fb)) == expect_ab  # fallback untouched
    delivered = capture["delivered"]()
    expect_c = [k for k in full if k[0] in ids["c"]]
    assert sorted(delivered) == expect_c  # HTTP store: C exactly once
    # store + fallback together == the table sink, exactly once
    assert sorted(delivered + fallback_keys(fb)) == full


def test_bq_crash_recovery_exactly_once(spark):
    """BQ insertAll body: mid-epoch driver crash + endpoint outage +
    checkpoint restart must end with store+fallback equal to the table
    sink exactly once."""
    from stream_processing_project_spark.streaming.connectors import (
        make_bigquery_warehouse_body,
    )

    cap = tempfile.mkdtemp(prefix="t-bq-crash-")
    fb = os.path.join(cap, "fallback")
    up_flag = os.path.join(cap, "endpoint_up")
    fake = FakeHttpSession(cap)

    def factory():
        # endpoint health is decided per send from the shared flag file —
        # the one channel driver, workers, and the test process all see
        return FakeHttpSession(
            cap, fail_pattern=None if os.path.exists(up_flag) else "insertAll"
        )

    def delivered():
        got = []
        for r in fake.captured():
            if r["method"] == "POST" and r["status"] == 200:
                for row in json.loads(r["body"])["rows"]:
                    got.append(_doc_key(row["json"], "event_ts"))
        return got

    def make_query(enriched, ckpt, crash):
        body = make_bigquery_warehouse_body(
            factory, "p1", "d1", "t1",
            base_url="http://emu:9050", batch_size=100, fallback_dir=fb,
        )
        if crash:
            def crashing(df, epoch_id):
                body(df, epoch_id)
                raise RuntimeError("simulated driver crash before commit")
            fn = crashing
        else:
            fn = body
        return (
            enriched.writeStream.outputMode("append")
            .foreachBatch(fn)
            .option("checkpointLocation", ckpt)
            .start()
        )

    _crash_recovery_scenario(
        spark, make_query,
        {"fallback": fb, "up_flag": up_flag, "delivered": delivered},
        "bq", "event_ts", "yyyy-MM-dd HH:mm:ss",
    )


def test_es_crash_recovery_exactly_once(spark):
    """ES _bulk body: same crash/recovery drive; the _bulk outage never
    touches the template URL, and recovered delivery routes documents to
    their event-date daily indices."""
    from stream_processing_project_spark.streaming.connectors import (
        make_es_search_body,
    )

    cap = tempfile.mkdtemp(prefix="t-es-crash-")
    fb = os.path.join(cap, "fallback")
    up_flag = os.path.join(cap, "endpoint_up")
    fake = FakeHttpSession(cap)

    def factory():
        return FakeHttpSession(
            cap, fail_pattern=None if os.path.exists(up_flag) else "_bulk"
        )

    def delivered():
        got = []
        for r in fake.captured():
            if r["method"] == "POST" and r["status"] == 200:
                lines = r["body"].rstrip("\n").split("\n")
                for action_s, doc_s in zip(lines[::2], lines[1::2]):
                    doc = json.loads(doc_s)
                    day = doc["event_timestamp"][:10]
                    assert json.loads(action_s) == {
                        "index": {"_index": f"engagement-events-{day}"}
                    }
                    got.append(_doc_key(doc, "event_timestamp"))
        return got

    def make_query(enriched, ckpt, crash):
        body = make_es_search_body(
            factory, "engagement-events",
            base_url="http://es:9200", batch_size=100, fallback_dir=fb,
        )
        if crash:
            def crashing(df, epoch_id):
                body(df, epoch_id)
                raise RuntimeError("simulated driver crash before commit")
            fn = crashing
        else:
            fn = body
        return (
            enriched.writeStream.outputMode("append")
            .foreachBatch(fn)
            .option("checkpointLocation", ckpt)
            .start()
        )

    _crash_recovery_scenario(
        spark, make_query,
        {"fallback": fb, "up_flag": up_flag, "delivered": delivered},
        "es", "event_timestamp", "yyyy-MM-dd'T'HH:mm:ss'Z'",
    )


def test_fallback_files_are_deterministic_per_chunk(spark):
    """Fallback spool names derive from (epoch, partition, chunk), so a
    replayed epoch overwrites its earlier spool instead of appending
    duplicates — re-running the same stream from scratch against the
    same fallback dir must leave the same file set, not double it."""
    cap1 = tempfile.mkdtemp(prefix="t-bq-det1-")
    fb = os.path.join(cap1, "fallback")

    def run(cap):
        q = bigquery_warehouse_sink(
            _enriched(spark),
            lambda: FakeHttpSession(cap, fail_pattern="insertAll"),
            batch_size=100,
            base_url="http://emu:9050",
            fallback_dir=fb,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(cap1)
    names_first = sorted(os.listdir(fb))
    assert names_first and all("_p" in n and "_c" in n for n in names_first)
    run(tempfile.mkdtemp(prefix="t-bq-det2-"))  # fresh checkpoint: epoch replays
    assert sorted(os.listdir(fb)) == names_first  # overwritten, not appended
