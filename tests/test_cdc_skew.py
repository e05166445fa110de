"""CDC upsert materialization (multi-version, delete-aware) and the
salted skew join — semantics pins on crafted frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_project_spark.operators.skew import salted_join
from stream_processing_project_spark.sources.cdc import materialize_upserts


def test_materialize_upserts_latest_version_wins(spark):
    changes = spark.createDataFrame(
        [
            # key 1: insert then update — update (later ts) wins
            (1, "alice", 10.0, "c", 100),
            (1, "alice2", 11.0, "u", 200),
            # key 2: insert then delete — key disappears
            (2, "bob", 20.0, "c", 100),
            (2, None, None, "d", 300),
            # key 3: delete then REINSERT (later ts) — key survives
            (3, "carol", 30.0, "d", 100),
            (3, "carol2", 31.0, "c", 400),
        ],
        ["id", "name", "value", "__op", "__ts_ms"],
    )
    got = {
        r["id"]: (r["name"], r["value"], r["__op"])
        for r in materialize_upserts(changes).collect()
    }
    assert got == {1: ("alice2", 11.0, "u"), 3: ("carol2", 31.0, "c")}


def test_salted_join_equals_plain_join(spark):
    """Salting must be semantics-preserving: same rows as a plain join,
    with one hot key spread across salt buckets."""
    big = spark.range(0, 10000).select(
        # 90% of rows hit key 7 — a hot key
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 5).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(10)], ["k", "label"]
    )
    plain = big.join(small, "k").select("k", "payload", "label")
    salted = salted_join(big, small, "k").select("k", "payload", "label")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_asof_join_semantics(spark):
    """As-of join pins: inclusive match at equal ts, latest-version-wins,
    NULL before the first version, per-key isolation."""
    from pyspark.sql import functions as F

    from stream_processing_project_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7),   # before any version → NULL
            (2, "2024-01-01 01:00:00", 7),   # exactly at v1 → v1 (inclusive)
            (3, "2024-01-01 02:30:00", 7),   # between v1 and v2 → v1
            (4, "2024-01-01 05:00:00", 7),   # after v2 → v2
            (5, "2024-01-01 05:00:00", 8),   # other key: only v9 applies
        ],
        ["event_id", "ts", "user_id"],
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            (7, "2024-01-01 01:00:00", "v1"),
            (7, "2024-01-01 03:00:00", "v2"),
            (8, "2024-01-01 04:00:00", "v9"),
        ],
        ["user_id", "vts", "version"],
    ).withColumn("vts", F.to_timestamp("vts"))
    got = {
        r.event_id: r.version
        for r in asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="vts"
        ).collect()
    }
    assert got == {1: None, 2: "v1", 3: "v1", 4: "v2", 5: "v9"}
