"""Deterministic synthetic data generator (SURVEY.md §2.1 S4).

The reference seeds its pipeline with a Faker-based generator
(generator/generate_data.py:62-91 content rows, :106-128 event batches):
random content ids, event types, durations, JSON props. Random output
can't be oracle-checked and can't be regenerated for regression runs, so
the engine-native generator is a PURE FUNCTION of the row index —
`spark.range(n)` plus integer/expression columns (the §2.1 S4 Spark
mapping) — making the corpus reproducible in any engine at any
parallelism: each row derives only from its id.

Scale: `spark.range` splits the index space across executors with zero
data movement and no source files; generating 10^12 rows is
embarrassingly parallel, and a re-run produces the identical corpus for
A/B benchmarking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 2026-01-01 00:00:00 UTC — generation epoch (sessions pin UTC)
EPOCH = 1767225600

EVENT_TYPES = ("view", "click", "signup", "purchase", "error")
CONTENT_TYPES = ("video", "audio", "article", "podcast")


def synthetic_content(spark: SparkSession, n: int = 5000) -> DataFrame:
    """Content dimension analogue (generate_data.py:62-91): n rows with a
    type and a duration. length_seconds spans [30, 7200) like the
    reference's random durations, but as a pure function of id."""
    idx = F.col("id")
    return spark.range(n).select(
        idx.alias("content_id"),
        _pick(idx % len(CONTENT_TYPES), CONTENT_TYPES).alias("content_type"),
        (30 + (idx * 17) % 7170).alias("length_seconds"),
    )


def synthetic_events(spark: SparkSession, n: int) -> DataFrame:
    """Event stream analogue (generate_data.py:106-128): user/content
    ids, a 5-value event-type vocabulary (the fixture vocabulary, not the
    reference's play/pause), an engagement duration, and a second-spaced
    event timestamp. All columns are integer arithmetic on the row id —
    the DuckDB oracle regenerates the identical corpus from range()."""
    idx = F.col("id")
    return spark.range(n).select(
        idx.alias("event_id"),
        ((idx * 7919) % 997).alias("user_id"),
        ((idx * 31) % 5000).alias("content_id"),
        _pick(idx % len(EVENT_TYPES), EVENT_TYPES).alias("event_type"),
        (((idx * 37) % 300000) / F.lit(1000.0)).alias("engagement_seconds"),
        F.date_format(
            F.timestamp_seconds(F.lit(EPOCH) + idx), "yyyy-MM-dd HH:mm:ss"
        ).alias("event_ts"),
    )


def _pick(residue, values: tuple[str, ...]):
    """CASE residue WHEN i THEN values[i] — JVM-side, codegen-friendly."""
    expr = F.lit(values[-1])
    for i in range(len(values) - 2, -1, -1):
        expr = F.when(residue == i, values[i]).otherwise(expr)
    return expr
