"""Sink/source format round-trips (K6 generalized: parquet is the
primary table format; JSONL/CSV/ORC must round-trip losslessly with an
explicit schema) and schema evolution on the warehouse path (a 100 TB
table WILL gain columns mid-life; old files must stay readable)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from stream_processing_project_spark.sources.fixtures import load_table
from tests.conftest import SF_SMOKE


def _events(spark):
    return load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )


def _assert_same_rows(a, b):
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_jsonl_roundtrip(spark):
    src = _events(spark)
    path = tempfile.mkdtemp(prefix="spe-jsonl-")
    src.write.mode("overwrite").json(path)
    back = spark.read.schema(src.schema).json(path)
    _assert_same_rows(src, back)


def test_csv_roundtrip(spark):
    src = _events(spark)
    path = tempfile.mkdtemp(prefix="spe-csv-")
    src.write.mode("overwrite").option("header", "true").csv(path)
    back = spark.read.schema(src.schema).option("header", "true").csv(path)
    _assert_same_rows(src, back)


def test_orc_roundtrip(spark):
    src = _events(spark)
    path = tempfile.mkdtemp(prefix="spe-orc-")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    _assert_same_rows(src, back)


def test_parquet_schema_evolution_merge(spark):
    """Old files lack the new column; mergeSchema unifies and old rows
    read as NULL — the add-column migration needs no rewrite."""
    path = tempfile.mkdtemp(prefix="spe-evolve-")
    v1 = _events(spark).limit(50)
    v1.write.mode("append").parquet(path)
    v2 = _events(spark).limit(30).withColumn("quality_score", F.lit(0.5))
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "quality_score" in merged.columns
    assert merged.count() == 80
    assert merged.filter(F.col("quality_score").isNull()).count() == 50
    assert merged.filter(F.col("quality_score") == 0.5).count() == 30
