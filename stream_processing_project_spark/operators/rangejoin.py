"""Range join — points matched to intervals containing them, made
scalable by bucketed binning.

Spark plans a bare `v BETWEEN lo AND hi` join as BroadcastNestedLoop
(or cartesian) — O(|points|×|intervals|) comparisons. The standard fix
(same technique Databricks' range-join hints apply): discretize the
domain into fixed-width buckets, explode each interval over the buckets
it covers, bucket each point, EQUI-join on the bucket id, then filter
the exact predicate. Each point now meets only the intervals overlapping
its bucket — with bucket_width ≈ typical interval width, the candidate
set per point is O(1) and the join is an ordinary shuffled hash join on
an integer key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 100.0,
) -> DataFrame:
    """Inner join: every (point, interval) pair with
    lo <= point.value <= hi. Output = points' columns ++ intervals'
    columns. Intervals spanning many buckets explode into one row per
    covered bucket (dedup is unnecessary: a point lives in exactly one
    bucket, so each qualifying pair meets exactly once)."""
    p = points.withColumn(
        "_b", F.floor(F.col(value_col) / F.lit(bucket_width)).cast("long")
    )
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    return (
        p.join(i, "_b")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) <= F.col(hi_col))
        )
        .drop("_b")
    )
