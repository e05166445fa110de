"""Batch scans over the driver-generated parquet fixtures.

Maps to the reference's source scans (SURVEY.md §2.1 S3/S5): columnar
parquet + Catalyst gives column pruning and predicate pushdown for free
— the reference hand-rolled both (3-of-6-column dimension SELECT,
EngagementProcessor.scala:83-85).

At 100 TB these reads are the dominant cost: never cache a fact table,
always let the filter/projection reach the scan (verify via
`.explain("formatted")` → `PushedFilters` / `ReadSchema`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from stream_processing_project_spark.schemas import FIXTURE_TABLES

# Compatibility shim: some fixture generations stored events.ts as parquet
# TIMESTAMP(NANOS), which Spark reads as epoch-nanos long under
# spark.sql.legacy.parquet.nanosAsLong and we floor-convert to micros
# (matching DuckDB's ns→us handling). Current fixtures use
# TIMESTAMP(MICROS, isAdjustedToUTC=false), which arrives as TimestampType
# directly (session.py pins inferTimestampNTZ=false), so the branch below
# is a no-op — kept so either fixture vintage loads correctly.
_NANO_TS_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Plain `spark.read.parquet` — no schema
    override (parquet carries its own), no cache (scale!).

    Timestamp normalization: the fixtures store ts as parquet
    TIMESTAMP(MICROS, isAdjustedToUTC=false). Under a session with
    `spark.sql.parquet.inferTimestampNTZ.enabled=true` (the default in
    Spark 4 — and the DRIVER's session, which does not inherit our
    session.py pin) that arrives as TIMESTAMP_NTZ, which functions like
    `unix_micros`/`unix_millis` reject outright. The fixture timestamps
    are semantically UTC instants, so we cast NTZ → TIMESTAMP (the
    session timezone is UTC in both our session and DuckDB's oracle
    reading of the same file, so wall-clock == instant and the cast is
    value-preserving). This makes every downstream query
    session-config-independent.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c, dt in df.dtypes:
        if dt == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    for c in _NANO_TS_COLS.get(name, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each fixture table as a temp view for the SQL surface."""
    for name in tables or FIXTURE_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def fan_out_if_narrow(df: DataFrame, target: int | None = None) -> DataFrame:
    """Ingest fan-out — the batch analogue of the Kafka source's
    `minPartitions` (SURVEY.md §2.1 S2): when a source delivers fewer
    splits than the cluster has cores (single-row-group parquet, a
    low-partition topic), CPU-heavy decode work downstream serializes
    on those few tasks. Round-robin repartition to defaultParallelism
    BEFORE the decode so it parallelizes; a NO-OP when the source is
    already wide — at 100 TB the scan yields thousands of splits and
    no gratuitous shuffle is added."""
    target = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
