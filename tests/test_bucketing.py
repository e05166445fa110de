"""Bucketed co-located join: correctness + the no-shuffle plan property
(the write-once-join-many pattern that matters at fact-fact scale)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_processing_project_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from stream_processing_project_spark.sources.fixtures import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=4)
    write_bucketed(o, "b_orders", "l_orderkey", n_buckets=4)
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    """Matching bucket specs → SortMergeJoin with NO Exchange on either
    side: the shuffle happened once at write time, not per query.
    (Auto-broadcast is disabled for the assertion — at fixture scale the
    planner would broadcast the small side and skip bucketed reads; the
    bucketed path is exactly for sides too big to broadcast.)"""
    lt, rt = bucketed_tables
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "l_orderkey")
        joined.write.mode("overwrite").format("noop").save()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan
    assert "Bucketed: true" in plan, plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey")
    got = bucketed_join(spark, lt, rt, "l_orderkey")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))
