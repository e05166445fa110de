"""Shared helpers for the query registry.

The DuckDB oracle CTE fragments here mirror — character for character in
semantics — what the Spark builders compute, including the reference's
quirks we reproduce deliberately:
  * engagement_pct is NULL unless the denominator is > 0 (P5,
    EngagementProcessor.scala:111-116);
  * the window "avg" is sum/count with a max(denominator,1) guard, not
    AVG() (A5, EngagementRedisSink.scala:189-193);
  * window-start timestamps are emitted as plain strings so Spark
    (tz-aware, session UTC) and DuckDB (naive UTC) hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stream_processing_project_spark.sources.fixtures import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- DuckDB oracle fragments (fixture-table shapes) ------------------------

# J1 + P3-P5 over the fixture mapping (events→engagement_events,
# customer→content dim; FIXTURES.md §6).
ENRICHED_CTE = """
enriched AS (
  SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value, e.props,
         c.c_mktsegment AS segment, c.c_acctbal AS acctbal,
         e.value AS engagement_seconds,
         CASE WHEN c.c_acctbal > 0
              THEN round(e.value / c.c_acctbal * 100.0, 2) END AS engagement_pct
  FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
)"""

# A1+A2 per-minute pre-aggregate (tumbling 1-minute window).
PER_MINUTE_CTE = """
per_minute AS (
  SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
         segment AS key,
         count(*) AS cnt,
         round(sum(engagement_pct), 2) AS sum_val
  FROM enriched
  GROUP BY 1, 2
)"""
