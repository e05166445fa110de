"""Table maintenance for parquet warehouses: small-file compaction with
range clustering.

A long-lived 100 TB table accumulates small files (per-trigger streaming
appends, K3/K4-style sinks; the reference's BigQuery/ES sinks flush every
5-8 s — BASELINE.md). Compaction rewrites a table into target_files
range-clustered files: `repartitionByRange` gives globally disjoint
key ranges per file and `sortWithinPartitions` orders rows inside each,
so parquet row-group min/max stats prune both files and pages on the
cluster key — the storage-side half of predicate pushdown. Run it
partition-by-partition (e.g. per event_date) so the rewrite is
incremental, not a full-table shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compact_range_clustered(
    df: DataFrame, path: str, cluster_cols: list[str], target_files: int
) -> None:
    """Rewrite df to `path` as target_files files, range-clustered and
    sorted on cluster_cols."""
    (
        df.repartitionByRange(target_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def data_files(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    )
