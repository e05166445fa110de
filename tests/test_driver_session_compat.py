"""Regression tests for the r01 TIMESTAMP_NTZ failure (VERDICT.md "What's
wrong" #1-2).

The driver runs queries in ITS OWN SparkSession which does not inherit
session.py's `spark.sql.parquet.inferTimestampNTZ.enabled=false` pin, so
fixture `ts` columns arrive as TIMESTAMP_NTZ there and `unix_micros`/
`unix_millis` call sites throw (r01 broke `olap_rolling_1h_avg`; five
more queries carried the same latent bug). The fix lives in
`sources/fixtures.load_table`, which now casts every TIMESTAMP_NTZ
column to TIMESTAMP (value-preserving: session TZ is UTC and fixture
timestamps are naive-UTC instants).

These tests flip the NTZ conf ON — reproducing the driver's session —
and run every formerly-exposed query end to end.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

NTZ_CONF = "spark.sql.parquet.inferTimestampNTZ.enabled"

# The six queries VERDICT.md names as NTZ-exposed, plus the flagship as a
# canary for the broad surface.
NTZ_EXPOSED = [
    "olap_rolling_1h_avg",
    "olap_sessionize",
    "cdc_ingest",
    "cdc_upsert_materialize",
    "cdc_scd2_history",
    "cdc_parse_audit",
    "flagship_topk_engagement",
]


@pytest.fixture()
def ntz_session(spark):
    """Session with the driver's (Spark 4 default) NTZ inference ON."""
    prev = spark.conf.get(NTZ_CONF)
    spark.conf.set(NTZ_CONF, "true")
    try:
        yield spark
    finally:
        spark.conf.set(NTZ_CONF, prev)


def test_loader_normalizes_ntz_to_timestamp(ntz_session):
    from stream_processing_project_spark.sources.fixtures import load_table

    # Raw read under NTZ inference yields timestamp_ntz ...
    raw = ntz_session.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert dict(raw.dtypes)["ts"] == "timestamp_ntz"
    # ... but load_table normalizes it.
    df = load_table(ntz_session, SF_SMOKE, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


@pytest.mark.parametrize("name", NTZ_EXPOSED)
def test_ntz_exposed_queries_run_under_driver_session(ntz_session, name):
    from stream_processing_project_spark.plans.registry import get

    df = get(name).builder(ntz_session, SF_SMOKE)
    # Materialize fully — the AnalysisException fired at plan time in
    # r01, but count() also exercises execution.
    assert df.count() >= 0
    for _, dt in df.dtypes:
        assert dt != "timestamp_ntz", f"{name} leaks TIMESTAMP_NTZ in its output"


# NOTE (r06, suite wall-clock): the former registry-wide "resolve under
# NTZ" sweep lived here and cost ~150 s per run — it was strictly weaker
# than scripts/rehearse_driver_gate.py, whose BARE SparkSession runs
# with Spark 4's inferTimestampNTZ default ON and EXECUTES every
# registered query against its oracle (analysis included). Registry-wide
# NTZ coverage therefore lives in the per-round rehearsal; this module
# keeps the targeted regression pins for the original r01 failure set.
