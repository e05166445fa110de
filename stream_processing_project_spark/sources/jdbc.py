"""JDBC dimension source (SURVEY.md §2.1 S3's second half).

The reference loads its dimension over JDBC with a hand-pruned SELECT
(EngagementProcessor.scala:83-85: 3 columns + WHERE pushed into the
database). Spark's JDBC source gives the same pushdown declaratively —
`spark.read.jdbc` with a filter/select on top sends the pruned SQL to
the database (verify via the DB's query log or `.explain` showing
PushedFilters on the JDBCRelation).

Config-switched: callers read parquet by default (the sandbox has no
database); set SPARK_GRAFT_JDBC_URL (plus optional
SPARK_GRAFT_JDBC_USER / SPARK_GRAFT_JDBC_PASSWORD /
SPARK_GRAFT_JDBC_DRIVER) to read the same logical table from a
database instead. The query surface is identical either way — only the
scan node changes.

Scale notes (the knobs that matter against a real warehouse):
  * partitionColumn/lowerBound/upperBound/numPartitions split the read
    into parallel range queries — without them the whole dimension
    arrives through ONE connection on one task;
  * fetchsize batches rows per round-trip (default 10 is unusable);
  * pushDownPredicate/pushDownLimit stay on so Catalyst forwards
    filters/limits into the database's own planner.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from stream_processing_project_spark.sources.fixtures import load_table

JDBC_URL_ENV = "SPARK_GRAFT_JDBC_URL"


def jdbc_configured() -> bool:
    return bool(os.environ.get(JDBC_URL_ENV))


def load_dimension(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    fetchsize: int = 10_000,
) -> DataFrame:
    """Scan a dimension table: parquet fixture by default, JDBC when
    SPARK_GRAFT_JDBC_URL is set. Filters/projections applied by the
    caller push down into either scan."""
    url = os.environ.get(JDBC_URL_ENV)
    if not url:
        return load_table(spark, sf_dir, name)

    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", name)
        .option("fetchsize", str(fetchsize))
        .option("pushDownPredicate", "true")
        .option("pushDownLimit", "true")
    )
    user = os.environ.get("SPARK_GRAFT_JDBC_USER")
    password = os.environ.get("SPARK_GRAFT_JDBC_PASSWORD")
    driver = os.environ.get("SPARK_GRAFT_JDBC_DRIVER")
    if user:
        reader = reader.option("user", user)
    if password:
        reader = reader.option("password", password)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column:
        # Parallel range read: bounds probed from the table itself keeps
        # the call self-contained; a production deployment would pass
        # known bounds to avoid the extra min/max round-trip.
        bounds = (
            spark.read.format("jdbc")
            .option("url", url)
            .option(
                "query",
                f"SELECT min({partition_column}) AS lo, max({partition_column}) AS hi FROM {name}",
            )
            .load()
            .first()
        )
        if bounds and bounds["lo"] is not None:
            reader = (
                reader.option("partitionColumn", partition_column)
                .option("lowerBound", str(bounds["lo"]))
                .option("upperBound", str(bounds["hi"]))
                .option("numPartitions", str(num_partitions))
            )
    return reader.load()
