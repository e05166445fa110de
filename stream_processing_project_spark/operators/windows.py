"""Windowed aggregation + top-k — the reference's analytical core
(SURVEY.md §2.4 A1-A7), which lives hand-rolled inside its Redis sink
(EngagementRedisSink.scala:126-199).

Spark-first: one `groupBy(bucket, key).agg(...)` per-minute pre-aggregate
(map-side partial aggregation → one shuffle keyed by (bucket, key)), then
the 10-minute sliding roll-up re-aggregates the *pre-aggregate* — exactly
the reference's merge loop (scala:160-184) but as a range-frame window
over ~|keys|×minutes rows instead of a per-batch Redis re-scan. At 100 TB
the pre-aggregate is tiny (low-cardinality keys × minutes), so the
expensive pass over raw events happens exactly once.

Batch and streaming share these: the same column logic is wrapped in
streaming/pipeline.py with event-time windows + watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def minute_agg(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    bucket: str = "minute",
) -> DataFrame:
    """A1+A2 — tumbling window grouped COUNT + SUM.

    Reference: HINCRBY count + ZINCRBY sum per (yyyyMMddHHmm, key)
    (EngagementRedisSink.scala:132-144). SUM skips NULLs natively, same
    as the reference's `foreach` over defined pcts.
    Output: w_start (string, oracle-safe), key, cnt, sum_val.
    """
    return (
        df.groupBy(
            F.date_format(F.date_trunc(bucket, F.col(ts_col)), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(value_col), 2).alias("sum_val"),
        )
    )


def sliding_rollup(
    per_minute: DataFrame,
    window_minutes: int = 10,
) -> DataFrame:
    """A4+A5 — sliding roll-up with 1-minute granularity over the
    per-minute pre-aggregate (reference merge loop,
    EngagementRedisSink.scala:160-193).

    Implemented as a RANGE frame over epoch seconds so the identical SQL
    runs on Spark and DuckDB. avg_val reproduces the reference's
    `sum(pct)/count(*)` — NOT avg(pct) — including its "denominator
    defaults to 1" guard (scala:190); parity noted in SURVEY.md §7.

    Float determinism: win_sum is round(sum of 2-dp values, 2) — safe,
    the true decimal sum is a multiple of 0.01, never at a rounding
    midpoint. win_avg is the RAW IEEE quotient of two deterministic
    operands — never round a division (Spark rounds the decimal string
    HALF_UP, DuckDB rounds the binary double; they disagree at .xx5).
    """
    span = (window_minutes - 1) * 60
    w = (
        Window.partitionBy("key")
        .orderBy(F.unix_timestamp(F.col("w_start"), "yyyy-MM-dd HH:mm:ss"))
        .rangeBetween(-span, 0)
    )
    return (
        per_minute.withColumn("win_cnt", F.sum("cnt").over(w))
        .withColumn("win_sum", F.round(F.sum("sum_val").over(w), 2))
        .withColumn(
            "win_avg",
            F.col("win_sum") / F.greatest(F.col("win_cnt"), F.lit(1)),
        )
    )


def topk(df: DataFrame, order_col: str, k: int, ascending: bool = False) -> DataFrame:
    """A6+A7 — top-k materialization (reference: delete-and-rebuild Redis
    sorted sets, EngagementRedisSink.scala:186-197; read back as
    ZREVRANGE top-3/top-5, monitor.py:167-168).

    Global ORDER BY + LIMIT: Spark plans this as TakeOrderedAndProject —
    per-partition top-k then a single k-row merge on the driver, no full
    sort, no shuffle of the data. Safe at any scale.
    """
    order = F.col(order_col).asc_nulls_last() if ascending else F.col(order_col).desc_nulls_last()
    return df.orderBy(order).limit(k)


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Top-k within each group via row_number ≤ k — the scalable form of
    A6 when the ranking is per-window rather than global (one shuffle on
    the group key, rank computed streamingly per partition). Pass
    tiebreak_cols (ascending) to make ranks total-ordered and therefore
    oracle-deterministic."""
    order = [F.col(order_col).desc_nulls_last()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def rollup_cascade(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    levels: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """Hypertable-style cascading rollup (TimescaleDB continuous-
    aggregate pattern): the finest level aggregates raw events ONCE;
    every coarser level re-aggregates the previous level's partials —
    count/sum compose losslessly, so an hour bucket sums its 60 minute
    buckets instead of rescanning raw data. At 100 TB the raw table is
    touched once per refresh regardless of how many granularities are
    served; each cascade step shuffles only |keys| × |buckets| rows.
    Output: level, bucket (string), key, cnt, sum_val — all levels
    unioned."""
    finest = levels[0]
    cur = (
        df.groupBy(
            F.date_trunc(finest, F.col(ts_col)).alias("bucket"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(value_col), 2).alias("sum_val"),
        )
    )
    out = cur.select(
        F.lit(finest).alias("level"),
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "key",
        "cnt",
        "sum_val",
    )
    for lvl in levels[1:]:
        cur = (
            cur.groupBy(
                F.date_trunc(lvl, F.col("bucket")).alias("bucket"), "key"
            )
            .agg(
                F.sum("cnt").alias("cnt"),
                F.round(F.sum("sum_val"), 2).alias("sum_val"),
            )
        )
        out = out.unionByName(
            cur.select(
                F.lit(lvl).alias("level"),
                F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
                "key",
                "cnt",
                "sum_val",
            )
        )
    return out
