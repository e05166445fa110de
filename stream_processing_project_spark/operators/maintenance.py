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


def zorder_code(df: DataFrame, cols: list[str], bits: int = 6):
    """Interleaved-bit Z-order code over quantile-rank buckets of
    `cols` — returns (df_with_buckets, z_column). Each column is mapped
    to a 2^bits-bucket rank via approxQuantile boundaries (sample-based
    sketch, driver-side — the same mechanism table formats use for
    OPTIMIZE ZORDER; quantile buckets, unlike min/max-uniform ones,
    stay balanced under skew), then bucket bits interleave so files cut
    from the code are hyper-rectangles in ALL clustered dimensions at
    once."""
    nb = 1 << bits
    out = df
    bucket_cols = []
    for i, c in enumerate(cols):
        probs = [j / nb for j in range(1, nb)]
        bounds = sorted(set(df.stat.approxQuantile(c, probs, 0.01)))
        arr = F.array(*[F.lit(b) for b in bounds])
        bcol = F.size(F.filter(arr, lambda b: b <= F.col(c).cast("double")))
        name = f"_zb{i}"
        out = out.withColumn(name, bcol.cast("long"))
        bucket_cols.append(name)
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for i, name in enumerate(bucket_cols):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(F.col(name), bit).bitwiseAND(F.lit(1)),
                    bit * len(cols) + i,
                )
            )
    return out, z


def compact_zorder(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    target_files: int,
    bits: int = 6,
) -> None:
    """Multi-dimensional clustering compaction: rewrite df into
    target_files files range-partitioned on a Z-order code of
    `cluster_cols`, so per-file min/max stats are tight on EVERY
    clustered column — point/range filters on any of them prune to
    O(target_files^(1/d)) files, where 1-D range clustering prunes only
    its single key. The write-side complement of predicate pushdown for
    the two-filter-column 100 TB warehouse table."""
    out, z = zorder_code(df, cluster_cols, bits)
    (
        out.withColumn("_z", z)
        .repartitionByRange(target_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z", *[c for c in out.columns if c.startswith("_zb")])
        .write.mode("overwrite")
        .parquet(path)
    )


def vacuum_versions(versions: list[str], keep_last: int = 1) -> list[str]:
    """Drop all but the newest `keep_last` copy-on-write version
    directories produced by upsert_materialized_view — the retention
    half of the MERGE pattern (with a table format this is VACUUM).
    Returns the removed paths."""
    import shutil

    doomed = versions[:-keep_last] if keep_last > 0 else list(versions)
    for p in doomed:
        shutil.rmtree(p, ignore_errors=True)
    del versions[: len(doomed)]
    return doomed


def backfill_partitions(df: DataFrame, path: str, partition_col: str) -> None:
    """Backfill: recompute a slice of a partitioned table (a bad day, a
    code-fix reprocess) and swap in ONLY the partitions present in
    `df` — dynamic partition overwrite. Static overwrite would truncate
    the whole table; appending would duplicate the slice. Untouched
    partitions keep their exact files (verified in tests), so a 100 TB
    warehouse backfills one day at the cost of that day."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
