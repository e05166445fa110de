"""Enrichment join — the reference's core dataflow step.

Reference: a whole-table heap cache + per-record O(1) map lookup with
left-outer semantics (EngagementProcessor.scala:72-135, README.md:30-38).
Spark-first: an explicit `broadcast()` left-outer equi-join of a static
dimension. The dimension replicates to every executor exactly like the
reference's heap map, but stays consistent per micro-batch, survives
restarts, and the join itself is codegen'd — no shuffle on the fact side,
which is the property that matters at 100 TB (the fact table never moves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_processing_project_spark.functions.scalar import (
    engagement_pct,
    engagement_seconds,
    ratio_pct,
)


def enrich_engagement(events: DataFrame, content: DataFrame) -> DataFrame:
    """Reference-shaped enrichment (J1 + P2-P6, SURVEY.md §2.2-2.3).

    events: CDC-unwrapped engagement_events rows (must carry __op);
    content: the dimension with (id, content_type, length_seconds).
    """
    dim = content.select(
        F.col("id").alias("_dim_id"),
        "content_type",
        "length_seconds",
    )
    return (
        events
        # P2 — keep snapshot reads + inserts only (EngagementProcessor.scala:107)
        .filter(F.col("__op").isin("r", "c"))
        # J1 — broadcast left-outer: missing content ids keep NULL dims
        # (EngagementProcessor.scala:108,125-126)
        .join(F.broadcast(dim), F.col("content_id") == F.col("_dim_id"), "left_outer")
        .drop("_dim_id")
        .withColumn("engagement_seconds", engagement_seconds(F.col("duration_ms")))
        .withColumn(
            "engagement_pct",
            engagement_pct(F.col("duration_ms"), F.col("length_seconds")),
        )
        # P6 — processing-time stamp (EngagementProcessor.scala:130)
        .withColumn("processing_time", F.current_timestamp())
    )


def enrich_fixture_events(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Same operator over the driver fixture tables (FIXTURES.md §6):
    `events` plays engagement_events, `customer` plays the content dim
    (user_id → c_custkey). Derived metrics mirror P4/P5:
      engagement_seconds := value            (pass-through metric)
      engagement_pct     := round(value / c_acctbal * 100, 2),
                            NULL unless c_acctbal > 0  (P5 NULL semantics)
    Deterministic (no processing_time) so the DuckDB oracle can match.
    """
    dim = customer.select(
        F.col("c_custkey").alias("_dim_id"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
    )
    return (
        events.join(F.broadcast(dim), F.col("user_id") == F.col("_dim_id"), "left_outer")
        .drop("_dim_id")
        .withColumn("engagement_seconds", F.col("value"))
        .withColumn("engagement_pct", ratio_pct(F.col("value"), F.col("acctbal")))
    )
