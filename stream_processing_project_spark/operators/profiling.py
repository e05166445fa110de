"""Dataset profiling: per-column statistics and value histograms.

The reference's only profiling surface is the monitor's COUNT(*) scans
(SURVEY.md S5/A8, monitor.py:82-154); a training-data pipeline needs the
fuller version — null counts, cardinalities, ranges, distributions — to
validate a corpus before spending GPU-hours on it. Both operators here
are single-scan aggregations: all metrics for all columns come out of
ONE pass over the table (map-side partial aggregation), then a constant
-size reshape to long format. Nothing here is per-row Python.

Scale notes:
  * `count(distinct)` over several columns compiles to an Expand (one
    duplicated stream per distinct aggregate) — exact, one scan, but
    the shuffle carries |cols| × rows. At 100 TB flip `exact=False` to
    use `approx_count_distinct` (HyperLogLog++, fixed-size sketch,
    mergeable map-side) — the profile stays one scan with O(1) state.
  * The histogram is a plain groupBy on a computed bucket — partial
    aggregation makes the shuffle O(n_buckets), independent of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str] = (),
    exact: bool = True,
) -> DataFrame:
    """Long-format profile: one row per column with
    (column, n_rows, n_nulls, n_distinct, min_val, max_val). Numeric
    columns report min/max of the value; string columns report min/max
    of the character length (a uniform DOUBLE schema — no cross-engine
    float-formatting issues from casting doubles to strings).

    Implementation: a single global `agg` computes every metric in one
    scan, then a `stack` reshapes the 1-row wide result to long format
    (constant-size, driver-free)."""
    aggs, n = [], F.count(F.lit(1))
    distinct = (
        F.countDistinct if exact else (lambda c: F.approx_count_distinct(c))
    )
    for c in numeric_cols:
        col = F.col(c)
        aggs += [
            (n - F.count(col)).alias(f"{c}__nulls"),
            distinct(col).alias(f"{c}__distinct"),
            F.min(col).cast("double").alias(f"{c}__min"),
            F.max(col).cast("double").alias(f"{c}__max"),
        ]
    for c in string_cols:
        col, ln = F.col(c), F.length(F.col(c))
        aggs += [
            (n - F.count(col)).alias(f"{c}__nulls"),
            distinct(col).alias(f"{c}__distinct"),
            F.min(ln).cast("double").alias(f"{c}__min"),
            F.max(ln).cast("double").alias(f"{c}__max"),
        ]
    wide = df.agg(n.alias("n_rows"), *aggs)
    cols = list(numeric_cols) + list(string_cols)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack}) AS "
        "(col_name, n_nulls, n_distinct, min_val, max_val)",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")


def value_histogram(
    df: DataFrame, col: str, bucket_width: float
) -> DataFrame:
    """Fixed-width histogram of a numeric column: bucket id
    (floor(value / width)), row count, and the exact min/max observed in
    the bucket. Pure groupBy — O(n_buckets) shuffle after map-side
    partials; floor() keeps bucket assignment float-exact across
    engines (no rounding of a division result is emitted)."""
    v = F.col(col)
    return (
        df.groupBy(
            F.floor(v / F.lit(bucket_width)).cast("int").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(v).alias("lo"),
            F.max(v).alias("hi"),
        )
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    bucket_width: float = 8.0,
    quantiles: dict[str, float] | None = None,
) -> DataFrame:
    """Per-group quantile estimates from a fixed-width histogram sketch
    — the MERGEABLE percentile shape for warehouse scale: per-partition
    bin counts combine map-side like any algebraic aggregate (state is
    O(bins) regardless of row count, partials union across days/shards
    by simple addition — none of that is true of exact percentiles or
    of engine-specific digest sketches). The estimate is the left edge
    of the first bin whose cumulative count reaches q·total — a
    deterministic integer decision (floor of a division for binning,
    bigint cumulative counts), so the sketch reproduces bit-for-bit in
    any engine and the result is fully value-hash-oracle-able, unlike
    approx_percentile's implementation-defined digest. Resolution is
    bucket_width; at 100 TB the window runs over the TINY histogram
    (|groups|·|bins| rows), never the raw data."""
    from pyspark.sql import Window

    quantiles = quantiles or {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    v = F.col(value_col)
    hist = df.groupBy(
        F.col(group_col),
        F.floor(v / F.lit(bucket_width)).cast("long").alias("bin"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy(group_col)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(group_col)
    c = hist.select(
        group_col,
        "bin",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("total"),
    )
    aggs = [F.max("total").alias("n")] + [
        (
            F.min(F.when(F.col("cum") >= F.lit(q) * F.col("total"), F.col("bin")))
            * F.lit(bucket_width)
        ).alias(name)
        for name, q in quantiles.items()
    ]
    return c.groupBy(group_col).agg(*aggs)


def drift_psi(
    df: DataFrame,
    value_col: str,
    group_col: str,
    period_col: str,
    bucket_width: float = 8.0,
) -> DataFrame:
    """Population Stability Index between two periods of a numeric
    column, per group — the standard feature/data drift monitor a
    training pipeline runs between corpus snapshots or train/serve
    windows: PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b), with add-one
    smoothing so empty bins stay finite. `period_col` must hold 'a'/'b'.

    Determinism (cross-engine oracle-able, same recipe as
    text.unigram_logprob): all bin counts and totals are exact bigints;
    the single ln runs on one division of exact-integer products and is
    quantized to integer micro-nats BEFORE the multiply; the per-bin
    contribution rounds to a bigint; the final PSI is a SUM OF BIGINTS
    — no float addition order anywhere. Reported as psi_micro (PSI ×
    1e6).

    Scale shape: one groupBy over the raw data (map-side combinable,
    O(|groups|·|bins|) out), everything after runs on the tiny
    histogram. Mergeable across shards like any histogram sketch."""
    v = F.col(value_col)
    is_a = (F.col(period_col) == "a").cast("long")
    binned = df.groupBy(
        F.col(group_col),
        F.floor(v / F.lit(bucket_width)).cast("long").alias("bin"),
    ).agg(
        F.sum(is_a).alias("ca"),
        F.sum(1 - is_a).alias("cb"),
    )
    totals = binned.groupBy(group_col).agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count(F.lit(1)).alias("nbins"),
    )
    j = binned.join(F.broadcast(totals), group_col)
    pa = (F.col("ca") + 1) / (F.col("na") + F.col("nbins"))
    pb = (F.col("cb") + 1) / (F.col("nb") + F.col("nbins"))
    ratio = ((F.col("ca") + 1) * (F.col("nb") + F.col("nbins"))) / (
        (F.col("cb") + 1) * (F.col("na") + F.col("nbins"))
    )
    lr_micro = F.round(F.log(ratio) * 1e6, 0).cast("bigint")
    contrib = F.round((pa - pb) * lr_micro, 0).cast("bigint")
    return (
        j.withColumn("contrib", contrib)
        .groupBy(group_col)
        .agg(
            F.sum("contrib").alias("psi_micro"),
            F.max("na").alias("n_a"),
            F.max("nb").alias("n_b"),
            F.max("nbins").alias("n_bins"),
        )
    )


# Count-min sketch geometry: d pairwise-independent integer hash rows
# over w buckets. (a_i, b_i) pairs are fixed odd constants; p is the
# Mersenne prime 2^31-1 (the classic universal-hash family ax+b mod p).
CMS_HASHES = ((998244353, 12345), (805306457, 54321), (469762049, 98765), (167772161, 24680))
CMS_PRIME = 2147483647


def _cms_bucket(item, a: int, b: int, width: int):
    return ((item * F.lit(a) + F.lit(b)) % F.lit(CMS_PRIME)) % F.lit(width)


def cms_sketch(df: DataFrame, item_col: str, width: int = 1024) -> DataFrame:
    """Build a count-min sketch of an integer item column: d×w counters
    as rows (h_row, bucket, cnt). The sketch is MERGEABLE by bucket-wise
    addition (shards/days/streams combine with a groupBy-sum), its size
    is d·w counters regardless of item cardinality, and — because the
    hash family is fixed integer arithmetic — the whole structure is
    reproducible on any engine, so estimates value-hash-oracle exactly
    (unlike library sketches with opaque seeds). One map-side-combined
    groupBy: the shuffle carries ≤ d·w rows per task."""
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("h_row"),
                _cms_bucket(F.col(item_col), a, b, width).alias("bucket"),
            )
            for i, (a, b) in enumerate(CMS_HASHES)
        ]
    )
    return (
        df.select(F.explode(rows).alias("h"))
        .groupBy("h.h_row", "h.bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, candidates: DataFrame, item_col: str, width: int = 1024
) -> DataFrame:
    """Point-query the sketch for each candidate item: estimate =
    min over hash rows of the counter at (row, h_row(item)). Guaranteed
    >= the true count (CMS never undercounts); error is bounded by
    (2/w)·N with high probability. The candidate set equi-joins the
    d·w-row sketch — broadcast-sized at any corpus scale."""
    probes = candidates.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("h_row"),
                        _cms_bucket(F.col(item_col), a, b, width).alias("bucket"),
                    )
                    for i, (a, b) in enumerate(CMS_HASHES)
                ]
            )
        ).alias("h"),
    ).select(item_col, "h.h_row", "h.bucket")
    return (
        probes.join(F.broadcast(sketch), ["h_row", "bucket"])
        .groupBy(item_col)
        .agg(F.min("cnt").alias("cms_est"))
    )


# --- mergeable rank sketch (bottom-k by deterministic hash) --------------------

RANK_SKETCH_P = 2147483647  # the KMV LCG modulus (profile_distinct_kmv_theta)
RANK_SKETCH_K = 1024


def rank_sketch(
    df: DataFrame, value_col, key_col, k: int = RANK_SKETCH_K
) -> DataFrame:
    """Bottom-k-by-hash rank sketch: the k rows whose deterministic LCG
    hash of a row-unique key is smallest — a fixed-size uniform sample
    WITHOUT replacement of the rows (an injective key makes the hash a
    pseudo-random permutation; the KLL/t-digest role with the repo's
    determinism contract). Properties the fixed-width histogram
    (`histogram_quantiles`) lacks:

    - no value-range assumption: works on unbounded/skewed domains
      where a fixed bucket width is wrong by construction;
    - proven distribution-free rank error: by DKW over k uniform
      samples, sup_v |F̂(v) − F(v)| ≤ sqrt(ln(2/δ)/(2k)) w.p. ≥ 1−δ
      (k=1024 → ±2.7 % rank at δ=0.01);
    - MERGEABLE: bottom-k of a union is the bottom-k of the shards'
      bottom-k's, so per-shard sketches combine losslessly by
      union → re-take (pinned in tests);
    - deterministic: hash, tie-breaks, and rank picks are exact
      integer decisions → the sketch itself value-hash-oracles,
      unlike approx_percentile's implementation-defined digest.

    Scale shape: orderBy(h).limit(k) compiles to TakeOrderedAndProject
    — per-partition top-k heaps merged k-at-a-time, never a global
    sort; the sketch is O(k) regardless of n."""
    h = (
        (key_col % F.lit(RANK_SKETCH_P)) * F.lit(1103515245) + F.lit(12345)
    ) % F.lit(RANK_SKETCH_P)
    return (
        df.select(h.alias("h"), F.col(value_col).alias("v"))
        .orderBy("h", "v")
        .limit(k)
    )


def rank_sketch_quantiles(
    sketch: DataFrame, q_pcts: tuple[int, ...] = (1, 5, 25, 50, 75, 90, 99)
) -> DataFrame:
    """Quantile estimates from a rank sketch: the sample value at rank
    ceil(q·m/100) — pure integer arithmetic ((q·m + 99) div 100), so
    the pick reproduces cross-engine. The windows run over the k-row
    sketch only (bounded by construction)."""
    from pyspark.sql import Window

    spark = sketch.sparkSession
    ranked = sketch.select(
        "v",
        F.row_number().over(Window.orderBy("v", "h")).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))).alias("m"),
    )
    qs = spark.createDataFrame([(q,) for q in q_pcts], "q_pct int")
    return ranked.join(
        F.broadcast(qs),
        F.col("r") == F.expr("(q_pct * m + 99) div 100"),
    ).select("q_pct", F.col("v").alias("est_value"), F.col("m").alias("sample_k"))
