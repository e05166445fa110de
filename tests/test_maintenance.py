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
