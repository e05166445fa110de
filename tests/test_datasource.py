"""Custom Python DataSource connector (sources/generator_source.py):
batch/streaming parity with the spark.range-based generator, partition
splitting, and micro-batch offset bookkeeping."""

from __future__ import annotations

import time

from stream_processing_project_spark.sources import generator_source
from stream_processing_project_spark.sources.synthetic import synthetic_events


def test_batch_source_matches_range_generator(spark):
    generator_source.register(spark)
    batch = (
        spark.read.format("cdc_events")
        .option("rows", 1500)
        .option("numPartitions", 6)
        .load()
    )
    assert batch.rdd.getNumPartitions() == 6
    got = sorted(tuple(r) for r in batch.collect())
    want = sorted(tuple(r) for r in synthetic_events(spark, 1500).collect())
    assert got == want


def test_stream_source_drains_in_bounded_batches(spark):
    generator_source.register(spark)
    stream = (
        spark.readStream.format("cdc_events")
        .option("rowsPerBatch", 400)
        .option("maxRows", 1500)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dsrc_stream")
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM dsrc_stream").collect()[0][0] >= 1500:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM dsrc_stream").collect())
    want = sorted(tuple(r) for r in synthetic_events(spark, 1500).collect())
    assert got == want  # every row exactly once, across many micro-batches


def test_batch_partitions_cover_index_space_exactly():
    """Property: for any (rows, numPartitions) the batch reader's splits
    tile [0, rows) exactly — no gaps, no overlaps, no empty tail drift."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from stream_processing_project_spark.sources.generator_source import (
        CdcEventsBatchReader,
    )

    @given(rows=st.integers(0, 10_000), k=st.integers(1, 64))
    @settings(max_examples=200, deadline=None)
    def check(rows, k):
        parts = CdcEventsBatchReader({"rows": rows, "numPartitions": k}).partitions()
        covered = []
        for p in parts:
            assert 0 <= p.start <= p.end <= rows
            covered.extend(range(p.start, p.end))
        assert covered == list(range(rows))

    check()


def test_stream_source_restart_resumes_exactly_once(spark):
    """Restart regression (ADVICE r01): a reader recreated on an existing
    checkpoint starts with a fresh in-memory cursor; latestOffset must
    never report an offset BEHIND the checkpointed index, or committed
    rows are re-planned and re-emitted. Run a bounded stream partway to a
    parquet sink, stop, restart on the SAME checkpoint, drain — the sink
    must hold every row exactly once."""
    import os
    import tempfile

    generator_source.register(spark)
    out = tempfile.mkdtemp(prefix="spe-dsrc-out-")
    ckpt = tempfile.mkdtemp(prefix="spe-dsrc-ckpt-")

    def start():
        stream = (
            spark.readStream.format("cdc_events")
            .option("rowsPerBatch", 300)
            .option("maxRows", 1200)
            .load()
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="100 milliseconds")
            .start()
        )

    q = start()
    deadline = time.time() + 90
    while time.time() < deadline and len(q.recentProgress) < 2:
        time.sleep(0.2)
    q.stop()  # some prefix committed; cursor state is lost with the reader

    q2 = start()  # NEW reader instance, cursor reset to 0 — must fast-forward
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            n = spark.read.parquet(out).count() if os.listdir(out) else 0
            if n >= 1200:
                break
            time.sleep(0.5)
    finally:
        q2.stop()

    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    want = sorted(tuple(r) for r in synthetic_events(spark, 1200).collect())
    assert got == want  # no duplicates, no gaps, across the restart
