"""Reference analytics surface as named queries (SURVEY.md §2.4, §3 E3).

These are the queries the reference actually answers — the Redis-sink
window aggregates (A1-A7) and the monitor's read path (A8-A11) — mapped
onto the driver fixture tables (events = engagement_events, customer =
content dimension, FIXTURES.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_processing_project_spark.operators.enrich import enrich_fixture_events
from stream_processing_project_spark.operators.windows import (
    minute_agg,
    sliding_rollup,
    topk,
)
from stream_processing_project_spark.plans.common import (
    ENRICHED_CTE,
    PER_MINUTE_CTE,
    t,
)
from stream_processing_project_spark.plans.registry import register


def _enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    return enrich_fixture_events(t(spark, sf_dir, "events"), t(spark, sf_dir, "customer"))


def _per_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minute_agg(_enriched(spark, sf_dir), "ts", "segment", "engagement_pct")


# ---------------------------------------------------------------------------
# Flagship — the end-to-end Redis-analytics answer (M1): scan → broadcast
# left join → derived metrics → tumbling window agg → roll-up → top-3
# (reference: EngagementRedisSink.scala:126-199 + monitor.py:167-173).
# ---------------------------------------------------------------------------
@register(
    "flagship_topk_engagement",
    oracle=f"""
WITH {ENRICHED_CTE.strip()},
{PER_MINUTE_CTE.strip()}
SELECT key AS segment,
       CAST(sum(cnt) AS BIGINT) AS access_count,
       round(sum(sum_val), 2) / greatest(sum(cnt), 1) AS avg_pct
FROM per_minute
GROUP BY key
ORDER BY avg_pct DESC NULLS LAST
LIMIT 3
""",
    tags=("bench", "flagship"),
)
def flagship_topk_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 segments by windowed engagement ratio, the reference's
    headline stat (stats:top_by_engagement, EngagementRedisSink.scala:186-193)."""
    rolled = (
        _per_minute(spark, sf_dir)
        .groupBy(F.col("key").alias("segment"))
        .agg(
            F.sum("cnt").alias("access_count"),
            (F.round(F.sum("sum_val"), 2) / F.greatest(F.sum("cnt"), F.lit(1))).alias(
                "avg_pct"
            ),
        )
    )
    return topk(rolled, "avg_pct", 3)


# --- A1: tumbling 1-minute grouped COUNT -----------------------------------
@register(
    "window_counts_1min",
    oracle=f"""
WITH {ENRICHED_CTE.strip()}
SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
       segment AS key,
       count(*) AS cnt
FROM enriched
GROUP BY 1, 2
""",
)
def window_counts_1min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — COUNT(*) GROUP BY window(1 min), key
    (reference: HINCRBY access:by_type, EngagementRedisSink.scala:132-139)."""
    return _per_minute(spark, sf_dir).select("w_start", "key", "cnt")


# --- A2: tumbling 1-minute grouped SUM --------------------------------------
@register(
    "window_sums_1min",
    oracle=f"""
WITH {ENRICHED_CTE.strip()}
SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
       segment AS key,
       round(sum(engagement_pct), 2) AS sum_val
FROM enriched
GROUP BY 1, 2
""",
)
def window_sums_1min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — SUM(engagement_pct) GROUP BY window, key; NULLs skipped natively
    (reference: ZINCRBY engagement:by_type, EngagementRedisSink.scala:141-144)."""
    return _per_minute(spark, sf_dir).select("w_start", "key", "sum_val")


# --- A4+A5: sliding 10-minute roll-up ---------------------------------------
@register(
    "sliding_10min_rollup",
    oracle=f"""
WITH {ENRICHED_CTE.strip()},
{PER_MINUTE_CTE.strip()}
SELECT w_start, key, cnt, sum_val,
       CAST(sum(cnt) OVER w AS BIGINT) AS win_cnt,
       round(sum(sum_val) OVER w, 2) AS win_sum,
       round(sum(sum_val) OVER w, 2) / greatest(sum(cnt) OVER w, 1) AS win_avg
FROM per_minute
WINDOW w AS (
  PARTITION BY key
  ORDER BY epoch(CAST(w_start AS TIMESTAMP))
  RANGE BETWEEN 540 PRECEDING AND CURRENT ROW
)
""",
)
def sliding_10min_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+A5 — 10-minute sliding totals at 1-minute granularity,
    re-aggregating the per-minute pre-aggregate (reference merge loop,
    EngagementRedisSink.scala:160-193). avg = sum/count, not AVG()."""
    return sliding_rollup(_per_minute(spark, sf_dir), window_minutes=10)


# --- A6+A7: top-5 by access count --------------------------------------------
@register(
    "topk_by_access",
    oracle=f"""
WITH {ENRICHED_CTE.strip()}
SELECT segment AS key, count(*) AS access_count
FROM enriched
GROUP BY segment
ORDER BY access_count DESC NULLS LAST, key
LIMIT 5
""",
)
def topk_by_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+A7 — stats:top_by_access, ZREVRANGE top-5
    (EngagementRedisSink.scala:194-197; monitor.py:167-168,185)."""
    agg = (
        _enriched(spark, sf_dir)
        .groupBy(F.col("segment").alias("key"))
        .agg(F.count(F.lit(1)).alias("access_count"))
        .orderBy(F.col("access_count").desc_nulls_last(), F.col("key"))
        .limit(5)
    )
    return agg


# --- A8: per-sink COUNT(*) ----------------------------------------------------
@register(
    "sink_counts",
    oracle="""
SELECT 'events' AS tbl, count(*) AS n FROM events
UNION ALL SELECT 'orders' AS tbl, count(*) AS n FROM orders
UNION ALL SELECT 'lineitem' AS tbl, count(*) AS n FROM lineitem
""",
)
def sink_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — global COUNT(*) per table, the monitor's lag inputs
    (monitor.py:82-83,110-111,127-128)."""
    parts = [
        t(spark, sf_dir, name).agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("tbl"), "n"
        )
        for name in ("events", "orders", "lineitem")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# --- A9: rate over a count time-series ---------------------------------------
@register(
    "rate_timeseries",
    oracle="""
WITH c AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
         count(*) AS cnt
  FROM events GROUP BY 1
)
SELECT w_start, cnt,
       CASE WHEN lag(cnt) OVER (ORDER BY w_start) IS NOT NULL THEN
         greatest(
           0,
           (cnt - lag(cnt) OVER (ORDER BY w_start))
             / (epoch(CAST(w_start AS TIMESTAMP))
                - lag(epoch(CAST(w_start AS TIMESTAMP))) OVER (ORDER BY w_start))
         )
       END AS rate_per_s
FROM c
""",
)
def rate_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — (count_now − count_prev)/Δt clamped at 0
    (monitor.py:223-229; stress_test.py:209-213)."""
    c = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("w_start")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("w_start")
    epoch = F.unix_timestamp(F.col("w_start"), "yyyy-MM-dd HH:mm:ss")
    prev_cnt = F.lag("cnt").over(w)
    prev_epoch = F.lag(epoch).over(w)
    return c.withColumn(
        "rate_per_s",
        F.when(
            prev_cnt.isNotNull(),
            F.greatest(F.lit(0), (F.col("cnt") - prev_cnt) / (epoch - prev_epoch)),
        ),
    )


# --- A10: lag (difference of two counts) --------------------------------------
@register(
    "lag_delta",
    oracle="""
SELECT CAST(a.n - b.n AS BIGINT) AS delta
FROM (SELECT count(*) AS n FROM events) a,
     (SELECT count(*) AS n FROM events WHERE event_type = 'purchase') b
""",
)
def lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — pg_count − sink_count style scalar delta (monitor.py:274-275)."""
    events = t(spark, sf_dir, "events")
    a = events.agg(F.count(F.lit(1)).alias("n_a"))
    b = events.filter(F.col("event_type") == "purchase").agg(F.count(F.lit(1)).alias("n_b"))
    return a.crossJoin(b).select((F.col("n_a") - F.col("n_b")).alias("delta"))


# --- A11: last-update marker ----------------------------------------------------
@register(
    "last_update",
    oracle="SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_update FROM events",
)
def last_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — SET stats:last_update = max timestamp seen
    (EngagementRedisSink.scala:199)."""
    return (
        t(spark, sf_dir, "events")
        .agg(F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_update"))
    )


# ---------------------------------------------------------------------------
# SQL entry point — the same engine surface through spark.sql (full parse →
# analyze → optimize lifecycle, SURVEY.md §3 E3 "plain spark.sql" mapping).
# ---------------------------------------------------------------------------
SQL_ENGAGEMENT_BY_SEGMENT = """
SELECT c.c_mktsegment AS segment,
       count(*) AS n_events,
       round(sum(e.value), 2) AS total_value
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register(
    "sql_engagement_by_segment",
    oracle="""
SELECT c.c_mktsegment AS segment,
       count(*) AS n_events,
       round(sum(e.value), 2) AS total_value
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def sql_engagement_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql entry point as a first-class surface: fixture tables
    registered as temp views, then ONE ANSI-SQL string — byte-identical
    to the DuckDB oracle — through the full Catalyst parse→analyze→
    optimize lifecycle. Proves users can drive the engine with SQL, not
    only the DataFrame API."""
    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(SQL_ENGAGEMENT_BY_SEGMENT)


@register(
    "topk_per_window",
    oracle="""
WITH """
    + ENRICHED_CTE.strip()
    + ","
    + PER_MINUTE_CTE.strip()
    + """
SELECT w_start, key, cnt, sum_val, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY w_start ORDER BY sum_val DESC NULLS LAST, key
  ) AS rank
  FROM per_minute
) WHERE rank <= 2
""",
)
def topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 in its per-window form: top-2 segments inside EVERY 1-minute
    window (vs the flagship's global board) — one shuffle on the window
    key, rank computed per partition (operators/windows.py::
    topk_per_group with a deterministic tie-break)."""
    from stream_processing_project_spark.operators.windows import topk_per_group

    return topk_per_group(
        _per_minute(spark, sf_dir),
        ["w_start"],
        "sum_val",
        k=2,
        tiebreak_cols=["key"],
    )


@register(
    "olap_gap_fill_hourly",
    oracle="""
WITH bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS mn, date_trunc('hour', max(ts)) AS mx
  FROM events WHERE user_id < 20 GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
  FROM bounds
),
agg AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket,
         count(*) AS cnt, round(sum(value), 2) AS val
  FROM events WHERE user_id < 20 GROUP BY 1, 2
)
SELECT g.user_id, strftime(g.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
       coalesce(a.cnt, 0) AS cnt, coalesce(a.val, 0.0) AS val
FROM grid g LEFT JOIN agg a ON g.user_id = a.user_id AND g.bucket = a.bucket
""",
)
def olap_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample/gap-fill (operators/resample.py): per-user hourly grid
    from first to last event with empty buckets materialized as zero —
    what rate/dashboard consumers need and a plain groupBy silently
    omits. Oracle builds the identical grid with generate_series."""
    from stream_processing_project_spark.operators.resample import gap_fill

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    filled = gap_fill(ev, "user_id", "ts", "value", step="1 hour", how="zero")
    return filled.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "cnt",
        "val",
    )


@register(
    "olap_rollup_cascade",
    oracle="""
WITH m AS (
  SELECT date_trunc('minute', ts) AS bucket, event_type AS key,
         count(*) AS cnt, round(sum(value), 2) AS sum_val
  FROM events GROUP BY 1, 2
),
h AS (
  SELECT date_trunc('hour', bucket) AS bucket, key,
         CAST(sum(cnt) AS BIGINT) AS cnt, round(sum(sum_val), 2) AS sum_val
  FROM m GROUP BY 1, 2
),
d AS (
  SELECT date_trunc('day', bucket) AS bucket, key,
         CAST(sum(cnt) AS BIGINT) AS cnt, round(sum(sum_val), 2) AS sum_val
  FROM h GROUP BY 1, 2
)
SELECT 'minute' AS level, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket, key, cnt, sum_val FROM m
UNION ALL
SELECT 'hour', strftime(bucket, '%Y-%m-%d %H:%M:%S'), key, cnt, sum_val FROM h
UNION ALL
SELECT 'day', strftime(bucket, '%Y-%m-%d %H:%M:%S'), key, cnt, sum_val FROM d
""",
)
def olap_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style cascading rollup (operators/windows.py::
    rollup_cascade): minute buckets aggregate raw events once; hour and
    day levels re-aggregate the previous level's partials — the
    continuous-aggregate refresh pattern. The oracle cascades
    identically (hour FROM minute, day FROM hour) so the re-aggregation
    rounding matches exactly."""
    from stream_processing_project_spark.operators.windows import rollup_cascade

    return rollup_cascade(
        t(spark, sf_dir, "events"), "ts", "event_type", "value"
    )


# --- cohort retention ---------------------------------------------------------
@register(
    "olap_cohort_retention",
    oracle="""
WITH first_seen AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', f.cohort_day, a.day) AS INTEGER) AS day_offset,
       count(*) AS n_users
FROM activity a JOIN first_seen f USING (user_id)
GROUP BY 1, 2
""",
)
def olap_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, counted
    on each later active day as an offset from their cohort — the
    standard engagement-retention read. Two aggregations and one join,
    all keyed on user_id so AQE can keep the exchanges aligned."""
    events = t(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# --- ordered funnel ------------------------------------------------------------
@register(
    "olap_funnel_stages",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS vt FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS ct
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.vt
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS pt
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.ct
  GROUP BY e.user_id
)
SELECT * FROM (
  SELECT 1 AS stage, 'view' AS event_type, count(*) AS n_users FROM v
  UNION ALL
  SELECT 2, 'click', count(*) FROM c
  UNION ALL
  SELECT 3, 'purchase', count(*) FROM p
)
""",
)
def olap_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel (view → click → purchase): a user reaches
    stage n+1 only with an event AFTER their earliest stage-n time —
    each stage is a min-aggregate joined forward, so the whole funnel is
    aggregate/join relational algebra (no per-user Python, no window
    sort), which is what survives at 100 TB of events."""
    events = t(spark, sf_dir, "events")

    def first_after(etype: str, prev: DataFrame, prev_ts: str, out_ts: str) -> DataFrame:
        return (
            events.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = first_after("click", v, "vt", "ct")
    p = first_after("purchase", c, "ct", "pt")

    def stage(n: int, etype: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(n).alias("stage"),
            F.lit(etype).alias("event_type"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return stage(1, "view", v).unionAll(stage(2, "click", c)).unionAll(
        stage(3, "purchase", p)
    )


# --- z-score outliers ----------------------------------------------------------
@register(
    "olap_outlier_zscore",
    oracle="""
WITH stats AS (
  SELECT event_type, count(*) AS n,
         round(sum(value), 2) AS s1,
         round(sum(value * value), 4) AS s2
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       (e.value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)) AS z
FROM events e JOIN stats s USING (event_type)
WHERE n > 1
  AND abs(e.value - s1 / n) > 3 * sqrt((s2 - s1 * s1 / n) / (n - 1))
""",
)
def olap_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type 3-sigma outliers — the training-data value-clipping
    primitive. Mean/std derive from ROUNDED sum and sum-of-squares (the
    only order-dependent floats), so every downstream division is
    engine-deterministic; built-in stddev is avoided deliberately (its
    merge formula differs per engine in the last ulps). One partial-agg
    shuffle for stats, broadcast join back, narrow filter."""
    events = t(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("s1"),
        F.round(F.sum(F.col("value") * F.col("value")), 4).alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    std = F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1))
    return (
        events.join(F.broadcast(stats), "event_type")
        .filter((F.col("n") > 1) & (F.abs(F.col("value") - mean) > 3 * std))
        .select(
            "event_id",
            "event_type",
            "value",
            ((F.col("value") - mean) / std).alias("z"),
        )
    )


# --- rolling time-range window --------------------------------------------------
@register(
    "olap_rolling_1h_avg",
    oracle="""
SELECT event_id, user_id,
       count(*) OVER w AS n_1h,
       round(sum(value) OVER w, 2) / count(*) OVER w AS avg_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
)
def olap_rolling_1h_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour average per user — a RANGE (time-interval) window
    frame, not a row-count frame: the frame is ts-value-bounded, so ties
    and gaps behave identically in any engine. Spark orders by epoch
    micros with rangeBetween; the rounded-sum/count quotient keeps float
    parity. One shuffle on user_id + per-key sort (inherent to the
    frame)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        (F.round(F.sum("value").over(w), 2) / F.count(F.lit(1)).over(w)).alias("avg_1h"),
    )


@register(
    "olap_cohort_ltv",
    oracle="""
WITH first_seen AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
),
rev AS (
  SELECT e.user_id, CAST(e.ts AS DATE) AS day,
         CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events e GROUP BY 1, 2
),
cohort_sizes AS (
  SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_n FROM first_seen
  GROUP BY 1
),
daily AS (
  SELECT f.cohort_day,
         CAST(date_diff('day', f.cohort_day, r.day) AS BIGINT) AS day_offset,
         CAST(sum(r.cents) AS BIGINT) AS cents
  FROM rev r JOIN first_seen f USING (user_id)
  GROUP BY 1, 2
),
cum AS (
  SELECT cohort_day, day_offset, cents,
         CAST(sum(cents) OVER (PARTITION BY cohort_day ORDER BY day_offset)
              AS BIGINT) AS cum_cents
  FROM daily
)
SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
       c.day_offset, c.cents, c.cum_cents, s.cohort_n,
       c.cum_cents * 1000 // s.cohort_n AS ltv_milli_per_user
FROM cum c JOIN cohort_sizes s USING (cohort_day)
""",
)
def olap_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves — the revenue companion of the retention
    triangle (`olap_cohort_retention`): cumulative cents per
    acquisition cohort by day offset, normalized per cohort member
    (the payback-period read marketing runs against CAC). Exact
    bigints end to end; the per-user normalization is integer
    milli-cents via div. The cumulative sum is a window PARTITIONED BY
    cohort ordered by offset — |cohorts| independent partitions of
    |offsets| rows each, never a global window. Shape at 100 TB: one
    user_id-keyed exchange (revenue rollup + first-seen join share
    it), one (cohort, offset) rollup, and the per-cohort windows."""
    from pyspark.sql import Window as W

    events = t(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    rev = events.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"))
    cohort_sizes = first_seen.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_n")
    )
    daily = (
        rev.join(first_seen, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.sum("cents").alias("cents"))
    )
    w = (
        W.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = daily.withColumn("cum_cents", F.sum("cents").over(w))
    return cum.join(F.broadcast(cohort_sizes), "cohort_day").select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "day_offset",
        "cents",
        "cum_cents",
        "cohort_n",
        F.expr("cum_cents * 1000 div cohort_n").alias("ltv_milli_per_user"),
    )
