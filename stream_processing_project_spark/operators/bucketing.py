"""Bucketed tables — co-located joins without a shuffle.

The 100 TB lever the parquet fixtures can't show: when two fact tables
are bucketed by the join key into the same bucket count, the join
requires NO exchange at all — each task reads matching buckets from
both sides. This is how a lineitem ⨝ orders that would shuffle tens of
TB per query becomes a narrow per-bucket zip, amortized once at write
time. (Spark bucketing needs a saveAsTable catalog entry; plain
.parquet(path) files don't carry bucket metadata.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8
) -> None:
    """Persist df as a bucketed+sorted managed table: co-locates and
    pre-sorts rows by key so later equi-joins/aggs on key skip both the
    exchange and the sort."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans a SortMergeJoin with NO Exchange on
    either side (assert via .explain — tests do)."""
    return spark.table(left_table).join(spark.table(right_table), key)
