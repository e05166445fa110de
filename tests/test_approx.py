"""Approximate-sketch scale paths (HLL, t-digest quantiles, Bloom-style
LSH). Exact twins are the oracled queries (olap_distinct_quantiles);
sketches aren't oracle-comparable across engines, so they're pinned here
with error-bound assertions instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_project_spark.sources.fixtures import load_table
from tests.conftest import SF_ORACLE


def test_approx_count_distinct_within_rsd(spark):
    """HLL++ estimate within its configured relative standard deviation
    (5σ guard) of the exact count — the 100 TB COUNT(DISTINCT) path."""
    ev = load_table(spark, SF_ORACLE, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= max(1, 5 * 0.02 * row.exact)


def test_percentile_approx_brackets_exact_median(spark):
    """percentile_approx with high accuracy lands within the value range
    spanned by the exact median's neighborhood."""
    ev = load_table(spark, SF_ORACLE, "events")
    row = ev.agg(
        F.expr("percentile(value, 0.5)").alias("exact"),
        F.expr("percentile_approx(value, 0.5, 10000)").alias("approx"),
    ).collect()[0]
    # t-digest at accuracy 10000 over 10k rows: tight but not exact
    assert abs(row.approx - row.exact) <= 0.05 * max(1.0, abs(row.exact))


def test_hll_rollup_estimates_within_sketch_error(spark):
    """Per-day HLL estimates and the sketch-union total are within 5%
    of the exact distinct counts, and the total comes from merging the
    daily sketches (one raw scan), not from re-scanning raw data."""
    from stream_processing_project_spark.plans.registry import all_queries
    from stream_processing_project_spark.sources.fixtures import load_table
    from tests.conftest import SF_ORACLE

    got = {
        r.grain: r.approx_users
        for r in all_queries()["profile_distinct_rollup_hll"]
        .builder(spark, SF_ORACLE)
        .collect()
    }
    ev = load_table(spark, SF_ORACLE, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    exact_total = ev.select("user_id").distinct().count()
    exact_daily = {
        r.day.strftime("%Y-%m-%d"): r.n
        for r in ev.groupBy("day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact_daily) | {"ALL"}
    assert abs(got["ALL"] - exact_total) <= 0.05 * exact_total
    for day, exact in exact_daily.items():
        assert abs(got[day] - exact) <= max(3, 0.05 * exact), day
