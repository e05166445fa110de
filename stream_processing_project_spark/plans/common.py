"""Shared helpers for the query registry.

The DuckDB oracle CTE fragments here mirror — character for character in
semantics — what the Spark builders compute, including the reference's
quirks we reproduce deliberately:
  * engagement_pct is NULL unless the denominator is > 0 (P5,
    EngagementProcessor.scala:111-116);
  * the window "avg" is sum/count with a max(denominator,1) guard, not
    AVG() (A5, EngagementRedisSink.scala:189-193);
  * window-start timestamps are emitted as plain strings so Spark
    (tz-aware, session UTC) and DuckDB (naive UTC) hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stream_processing_project_spark.sources.fixtures import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- DuckDB oracle fragments (fixture-table shapes) ------------------------

# J1 + P3-P5 over the fixture mapping (events→engagement_events,
# customer→content dim; FIXTURES.md §6).
ENRICHED_CTE = """
enriched AS (
  SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value, e.props,
         c.c_mktsegment AS segment, c.c_acctbal AS acctbal,
         e.value AS engagement_seconds,
         CASE WHEN c.c_acctbal > 0
              THEN round(e.value / c.c_acctbal * 100.0, 2) END AS engagement_pct
  FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
)"""

# A1+A2 per-minute pre-aggregate (tumbling 1-minute window).
PER_MINUTE_CTE = """
per_minute AS (
  SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
         segment AS key,
         count(*) AS cnt,
         round(sum(engagement_pct), 2) AS sum_val
  FROM enriched
  GROUP BY 1, 2
)"""


def bucketed_running_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    tie_cols: list[str] | None = None,
    descending: bool = False,
    n_buckets: int = 32,
    out_col: str = "cum",
    plan_offsets: bool = False,
    pin_input: bool = True,
):
    """Global ordered running sum WITHOUT a single-partition window —
    the range-partitioned ranking idiom (r04; first used by
    olap_abc_pareto): approxQuantile boundaries on `order_col` split
    rows into value ranges, the cumulative window runs PER RANGE in
    parallel, and each range adds a driver-computed prefix offset
    (≤ n_buckets+1 rows collected — bounded by construction).

    The result is bucketing-invariant: offset + within-range cumsum
    equals the global ordered cumsum for ANY monotone boundary set, so
    the sketch boundaries need no cross-partitioning determinism. The
    bucket id is a pure function of `order_col`, so tied rows always
    share a range and `tie_cols` only order within it. NULL order
    values sort last (nulls_last both directions), matching
    desc_nulls_last / asc_nulls_last window semantics.

    `order_col` must be NUMERIC (approxQuantile's precondition — the
    range boundaries come from its sketch); non-numeric orderings fall
    back to the plain global ordered window with a one-line warning in
    the plan comment sense: correct, serial at the margin, and the
    caller should quantize or map the ordering to a numeric key to get
    the partitioned form.

    `plan_offsets=True` (r07 verdict task 3 — amortize the construction
    constant): the ENTIRE construction moves into the lazy plan — no
    persist, no driver jobs. Boundaries come from an in-plan
    `approx_percentile` 1-row aggregate crossJoined as a broadcast
    scalar (the denominators idiom), and the per-range prefix offsets
    from a ≤(n_buckets+1)-row window over the per-bucket sums joined
    back as a broadcast — bucketing-invariance is exactly what makes
    the sketchier in-plan boundary source legal (ANY monotone boundary
    set yields the same cumsum; only parallel balance varies, and the
    percentile sketch keeps it balanced). The construction reads its
    input three times IN ONE JOB (bounds agg, per-bucket sums, main),
    so the input is lazily pinned here (r12, VERDICT r11 task 7) and
    all three reads serve from one computation at action time — every
    plan_offsets consumer is single-pass on its input lineage. Pass
    `pin_input=False` when `df` is ALREADY a checkpoint (sax's vals):
    re-pinning a pinned frame would copy its blocks for nothing.

    The input is persisted for the CONSTRUCTION phase only (boundary
    sketch + per-range sums are driver actions; without the cache each
    would re-scan the input's full lineage) and released before
    returning — the kmeans_fit lifetime pattern, so registry-wide
    sweeps accumulate nothing and the returned plan recomputes the
    input in one pass.

    Returns (df + out_col, bucket_col_name) — callers drop the bucket
    column when done; it is exposed so plan pins can assert the window
    partitions on it."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.types import NumericType

    ties = tie_cols or []
    if not isinstance(df.schema[order_col].dataType, NumericType):
        oc = F.col(order_col)
        order = [
            oc.desc_nulls_last() if descending else oc.asc_nulls_last(),
            *[F.col(c) for c in ties],
        ]
        w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        return (
            df.withColumn("_rsb", F.lit(0)).withColumn(
                out_col, F.sum(value_col).over(w)
            ),
            "_rsb",
        )
    oc = F.col(order_col)
    order = [
        oc.desc_nulls_last() if descending else oc.asc_nulls_last(),
        *[F.col(c) for c in ties],
    ]
    if plan_offsets:
        if pin_input:
            df = df.localCheckpoint(eager=False)
        probes = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
        bounds_row = df.agg(
            F.array_sort(
                F.array_distinct(
                    F.expr(
                        f"approx_percentile(CAST({order_col} AS DOUBLE),"
                        f" array({probes}), 10000)"
                    )
                )
            ).alias("_rs_bs")
        )
        in_front = (
            (lambda b: b > oc.cast("double"))
            if descending
            else (lambda b: b < oc.cast("double"))
        )
        # bucket id = #boundaries in front of the value in the chosen
        # direction (descending counts b > v), so ids stay monotone
        # with the ordering; NULL order values take the last bucket
        # (nulls_last), and an all-NULL percentile (empty input) folds
        # everything into bucket 0
        bucket = F.when(
            oc.isNull() | F.col("_rs_bs").isNull(),
            F.coalesce(F.size("_rs_bs"), F.lit(0)),
        ).otherwise(F.size(F.filter(F.col("_rs_bs"), in_front)))
        bucketed = (
            df.crossJoin(F.broadcast(bounds_row))
            .withColumn("_rsb", bucket)
            .drop("_rs_bs")
        )
        per_range = bucketed.groupBy("_rsb").agg(
            F.sum(value_col).alias("_rs_s")
        )
        woff = Window.orderBy("_rsb").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = per_range.select(
            "_rsb",
            F.coalesce(F.sum("_rs_s").over(woff), F.lit(0)).alias("_rs_off"),
        )
        w = (
            Window.partitionBy("_rsb")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return (
            bucketed.join(F.broadcast(offsets), "_rsb")
            .withColumn(out_col, F.col("_rs_off") + F.sum(value_col).over(w))
            .drop("_rs_off"),
            "_rsb",
        )
    df = df.persist()
    try:
        probe = [i / n_buckets for i in range(1, n_buckets)]
        bounds = sorted(
            {float(b) for b in df.approxQuantile(order_col, probe, 0.001)},
            reverse=descending,
        )
        barr = F.array(*[F.lit(b) for b in bounds])
        oc = F.col(order_col)
        in_front = (lambda b: b > oc) if descending else (lambda b: b < oc)
        bucket = F.when(oc.isNull(), F.lit(len(bounds))).otherwise(
            F.size(F.filter(barr, in_front))
        )
        bucketed = df.withColumn("_rsb", bucket)
        order = [
            oc.desc_nulls_last() if descending else oc.asc_nulls_last(),
            *[F.col(c) for c in ties],
        ]
        w = (
            Window.partitionBy("_rsb")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        per_range = {
            int(r["b"]): r["s"]
            for r in bucketed.groupBy(F.col("_rsb").alias("b"))
            .agg(F.sum(value_col).alias("s"))
            .collect()
        }
    finally:
        df.unpersist(blocking=False)
    offsets, acc = {}, 0
    for b in sorted(per_range):
        offsets[b] = acc
        acc += per_range[b] or 0
    off = F.element_at(
        F.create_map(*[F.lit(x) for b in offsets for x in (b, offsets[b])]),
        F.col("_rsb"),
    )
    return (
        bucketed.withColumn(out_col, off + F.sum(value_col).over(w)),
        "_rsb",
    )
