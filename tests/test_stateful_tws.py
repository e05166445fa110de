"""transformWithState (Spark 4 typed-state API) — environment-gated: the
state-server protocol requires google.protobuf, absent in some
containers. Wherever it's available, the MapState processor must agree
with the batch GROUP BY (the same equivalence the
applyInPandasWithState query pins)."""

from __future__ import annotations

import importlib.util

import pytest

from pyspark.sql import functions as F

from stream_processing_project_spark.streaming import pipeline
from tests.conftest import SF_SMOKE

try:
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:  # no 'google' namespace package at all
    _HAS_PROTOBUF = False


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState state server needs google.protobuf",
)
def test_event_type_counts_tws_matches_batch(spark):
    from stream_processing_project_spark.operators.stateful import (
        event_type_counts_stream,
    )
    from stream_processing_project_spark.sources.fixtures import load_table

    events = pipeline.file_event_stream(spark, SF_SMOKE)
    log = pipeline.run_to_completion(
        event_type_counts_stream(events), output_mode="update"
    )
    got = sorted(
        map(
            tuple,
            log.groupBy("user_id", "event_type")
            .agg(F.max("cnt").alias("cnt"))
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            load_table(spark, SF_SMOKE, "events")
            .groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect(),
        )
    )
    assert got == want
