"""Resample / gap-fill — regularize an irregular event series onto a
fixed time grid per key, with empty buckets materialized (zero/NULL) or
forward-filled.

Time-series consumers (dashboards, rate computations like the monitor's
delta/Δt, ML feature windows) need every bucket present; a groupBy over
raw events silently omits empty buckets. The grid is generated per key
with `sequence()` (codegen'd, no driver loop), exploded, and
left-joined with the bucketed aggregate — one shuffle on the key for
the grid bounds, one for the join. Forward-fill is a per-key window
`last(ignorenulls)` — the same carry idiom as the as-of join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_grid(df: DataFrame, key_col: str, ts_col: str, step: str) -> DataFrame:
    """Per-key dense bucket grid from each key's first to last event
    (bucket-truncated, inclusive)."""
    unit = step.split()[-1].rstrip("s")  # "1 hour" -> "hour"
    bounds = df.groupBy(key_col).agg(
        F.date_trunc(unit, F.min(ts_col)).alias("_mn"),
        F.date_trunc(unit, F.max(ts_col)).alias("_mx"),
    )
    return bounds.select(
        key_col,
        F.explode(
            F.sequence("_mn", "_mx", F.expr(f"INTERVAL {step}"))
        ).alias("bucket"),
    )


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    how: str = "zero",
) -> DataFrame:
    """Bucketed count+sum per key on a dense grid. how='zero' fills
    empty buckets with 0 (rate semantics); how='ffill' carries the last
    seen sum forward (gauge semantics)."""
    unit = step.split()[-1].rstrip("s")
    agg = df.groupBy(
        key_col, F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum(value_col), 2).alias("val"),
    )
    grid = time_grid(df, key_col, ts_col, step)
    joined = grid.join(agg, [key_col, "bucket"], "left_outer")
    if how == "zero":
        return joined.select(
            key_col,
            "bucket",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.coalesce("val", F.lit(0.0)).alias("val"),
        )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key_col,
        "bucket",
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
        F.last("val", ignorenulls=True).over(w).alias("val"),
    )
