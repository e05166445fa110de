"""The JDBC dimension seam (SURVEY.md S3): no database exists in the
sandbox, so these pin the config switch and the parquet-default path;
the JDBC branch is exercised up to reader construction."""

from __future__ import annotations

import pytest

from stream_processing_project_spark.sources import jdbc
from tests.conftest import SF_SMOKE


def test_defaults_to_parquet_fixture(spark, monkeypatch):
    monkeypatch.delenv(jdbc.JDBC_URL_ENV, raising=False)
    assert not jdbc.jdbc_configured()
    df = jdbc.load_dimension(spark, SF_SMOKE, "customer")
    assert "c_custkey" in df.columns and df.count() > 0


def test_jdbc_branch_reaches_the_connector(spark, monkeypatch):
    """With a URL set, the read must go through the JDBC source (the
    unreachable host proves the parquet path was NOT taken)."""
    monkeypatch.setenv(jdbc.JDBC_URL_ENV, "jdbc:postgresql://localhost:1/nope")
    assert jdbc.jdbc_configured()
    with pytest.raises(Exception) as exc:
        jdbc.load_dimension(spark, SF_SMOKE, "customer").count()
    msg = str(exc.value).lower()
    assert "jdbc" in msg or "connection" in msg or "driver" in msg


def test_dim_scan_query_unaffected_by_default(spark, monkeypatch):
    from stream_processing_project_spark.plans.registry import get

    monkeypatch.delenv(jdbc.JDBC_URL_ENV, raising=False)
    df = get("dim_scan").builder(spark, SF_SMOKE)
    assert df.columns == ["c_custkey", "c_mktsegment", "c_acctbal"]
    assert df.count() > 0
