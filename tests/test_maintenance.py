"""Compaction: a fragmented table rewritten into few range-clustered
files whose per-file key ranges are disjoint — the property that lets
parquet min/max stats prune files/row-groups on the cluster key."""

from __future__ import annotations

import tempfile

import pyarrow.parquet as pq

from stream_processing_project_spark.operators.maintenance import (
    compact_range_clustered,
    data_files,
)
from stream_processing_project_spark.sources.fixtures import load_table
from tests.conftest import SF_SMOKE


def test_compact_range_clustered(spark):
    events = load_table(spark, SF_SMOKE, "events")
    n = events.count()

    fragmented = tempfile.mkdtemp(prefix="spe-frag-")
    events.repartition(64).write.mode("overwrite").parquet(fragmented)
    assert len(data_files(fragmented)) == 64

    compacted = tempfile.mkdtemp(prefix="spe-compact-")
    compact_range_clustered(
        spark.read.parquet(fragmented), compacted, ["event_id"], target_files=4
    )

    files = data_files(compacted)
    assert len(files) == 4
    assert spark.read.parquet(compacted).count() == n

    # disjoint per-file event_id ranges → file/row-group pruning works
    ranges = []
    for f in files:
        col = pq.read_table(f, columns=["event_id"])["event_id"].to_pylist()
        assert col == sorted(col)  # sorted within file
        ranges.append((min(col), max(col)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo  # no overlap between consecutive files


def test_zorder_prunes_both_dimensions(spark):
    """Z-order on (x, y) into 16 files ≈ a 4×4 tile grid: a 1/4-width
    slice on EITHER column intersects only ~1/4 of the files' min/max
    ranges. 1-D range clustering on x prunes x-slices but y-slices
    touch every file — that contrast is the point of Z-ordering."""
    import tempfile

    from stream_processing_project_spark.operators.maintenance import (
        compact_zorder,
    )

    rows = [(i, float(i % 64), float(i // 64)) for i in range(4096)]
    df = spark.createDataFrame(rows, "id long, x double, y double")

    zpath = tempfile.mkdtemp(prefix="spe-zorder-")
    compact_zorder(df, zpath, ["x", "y"], target_files=16)
    files = data_files(zpath)
    assert len(files) == 16
    assert spark.read.parquet(zpath).count() == 4096

    def files_touching(col, lo, hi):
        n = 0
        for f in files:
            vals = pq.read_table(f, columns=[col])[col].to_pylist()
            if min(vals) <= hi and max(vals) >= lo:
                n += 1
        return n

    # a 1/4-slice covers 4 of 16 tiles; sample-based range cuts need not
    # align with tile boundaries, so each curve run may straddle one
    # extra file — ≤ 8 of 16 (vs all 16 unclustered / 1-D off-key)
    assert files_touching("x", 0.0, 15.0) <= 8
    assert files_touching("y", 0.0, 15.0) <= 8

    # contrast: 1-D clustering on x cannot prune y-slices
    rpath = tempfile.mkdtemp(prefix="spe-range-")
    compact_range_clustered(df, rpath, ["x"], target_files=16)
    rfiles = data_files(rpath)
    touched_y = 0
    for f in rfiles:
        vals = pq.read_table(f, columns=["y"])["y"].to_pylist()
        if min(vals) <= 15.0 and max(vals) >= 0.0:
            touched_y += 1
    assert touched_y == len(rfiles)


def test_vacuum_versions_keeps_newest(tmp_path):
    from stream_processing_project_spark.operators.maintenance import (
        vacuum_versions,
    )

    paths = []
    for i in range(3):
        d = tmp_path / f"v{i}"
        d.mkdir()
        (d / "part.parquet").write_bytes(b"x")
        paths.append(str(d))
    removed = vacuum_versions(paths, keep_last=1)
    assert removed == [str(tmp_path / "v0"), str(tmp_path / "v1")]
    assert paths == [str(tmp_path / "v2")]
    assert not (tmp_path / "v0").exists() and (tmp_path / "v2").exists()


def test_backfill_rewrites_only_target_partitions(spark, tmp_path):
    import os

    from stream_processing_project_spark.operators.maintenance import (
        backfill_partitions,
    )

    path = str(tmp_path / "wh")
    rows = [(i, f"2024-01-0{1 + i % 3}", float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, day string, v double")
    df.write.partitionBy("day").parquet(path)

    def files(day):
        d = os.path.join(path, f"day={day}")
        return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))

    before = {d: files(d) for d in ["2024-01-01", "2024-01-02", "2024-01-03"]}

    fixed = spark.createDataFrame(
        [(100, "2024-01-02", 999.0)], "id long, day string, v double"
    )
    backfill_partitions(fixed, path, "day")

    # untouched partitions keep their exact files; the target was replaced
    assert files("2024-01-01") == before["2024-01-01"]
    assert files("2024-01-03") == before["2024-01-03"]
    assert files("2024-01-02") != before["2024-01-02"]
    out = spark.read.parquet(path)
    assert out.filter("day = '2024-01-02'").collect()[0].v == 999.0
    assert out.filter("day != '2024-01-02'").count() == 20
