"""Dataset sampling for training-data pipelines: deterministic splits
and token-budget selection.

Splits must be a PURE FUNCTION of the document identity — not of
partitioning, row order, cluster size, or engine — so the same document
lands in the same split on every run of every system that touches the
corpus. We hash the id (md5 → first 8 hex digits → int, available in
every engine including the DuckDB oracle) and cut [0, 100) by
percentage. `rand()`/`sample()` CANNOT give this guarantee (seeded
per-partition → repartitioning reshuffles the split).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def split_bucket(id_col: Column) -> Column:
    """Stable [0, 100) bucket from a numeric id: Knuth multiplicative
    hash ((id × 2654435761) mod 2³²) mod 100 — pure integer arithmetic,
    so ANY engine reproduces it exactly (the DuckDB oracle recomputes
    it). For string ids, hash to a number first (e.g. md5 prefix) with
    the same expression on both sides.

    Id-range precondition (here and at every other `id * 2654435761`
    site engine+oracle): ids must stay below int64_max / 2654435761
    ≈ 3.47e9 or the product wraps int64 Spark-side while DuckDB's `%`
    overflow-errors. Synthetic/TPC-H ids are far below this; corpora
    with wider ids should pre-fold (`pmod(id, 2^32)`) or use the
    16/16-split mix in similarity.kmeans_quantize (bit-identical below
    2^32, overflow-safe to 2^32·2^16)."""
    return (id_col.cast("long") * F.lit(2654435761)) % F.lit(4294967296) % 100


def train_val_test(
    df: DataFrame, id_col: str = "doc_id", val_pct: int = 10, test_pct: int = 10
) -> DataFrame:
    """Adds a `split` column: test = bucket < test_pct, val = next
    val_pct buckets, train = the rest. Pure projection — no shuffle, no
    state; re-runs and engine swaps reproduce the split exactly."""
    b = split_bucket(F.col(id_col))
    return df.withColumn(
        "split",
        F.when(b < test_pct, "test")
        .when(b < test_pct + val_pct, "val")
        .otherwise("train"),
    )


def token_budget_select(
    df: DataFrame,
    token_col: str,
    budget: int,
    priority_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Select documents in priority order until the cumulative token
    count exceeds `budget` — "fill a 1B-token training mix". Documents
    are ordered by (priority desc, id) and kept while the RUNNING total
    up to and including each doc stays <= budget (greedy prefix; the
    first overflowing doc is excluded).

    Scale shape (r04, formerly a documented swap): the running total
    is range-partitioned (plans/common.bucketed_running_sum) — quantile
    ranges on the priority cumulate in parallel and add driver-computed
    prefix offsets, so there is no single-ordering-partition window and
    a 100 TB corpus pays one bounded collect (≤33 range sums) instead
    of a serial global sort. Non-NUMERIC priority/id orderings fall
    back to the plain ordered window inside the helper (approxQuantile
    boundaries need a numeric column) — quantize or map the ordering
    to numbers to keep the partitioned form."""
    from stream_processing_project_spark.plans.common import (
        bucketed_running_sum,
    )

    cum, bcol = bucketed_running_sum(
        df,
        token_col,
        priority_col or id_col,
        [id_col] if priority_col else [],
        descending=bool(priority_col),
        out_col="_cum",
    )
    return cum.filter(F.col("_cum") <= budget).drop("_cum", bcol)


def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    capacity: int = 256,
    key_col: str = "lang",
    id_col: str = "doc_id",
    shards: int | None = None,
) -> DataFrame:
    """Greedy sequence packing: assign documents to fixed-capacity
    training sequences ("bins" of `capacity` tokens) without splitting a
    document. Within each packing group documents are taken in id
    order; a new bin opens whenever the next document would overflow the
    current one (a document larger than `capacity` gets a bin of its
    own). Output adds `pack_id` (0-based per group) and, when sharded,
    the `_shard` column identifying the group.

    Packing is a sequential recurrence BY DEFINITION (each assignment
    depends on the running fill), so it cannot be a window function; it
    runs as an Arrow-batched `applyInPandas` per group — a few
    microseconds per document. At 100 TB the parallelism lever is the
    GROUPING: `shards=K` packs per (key, pmod(id-hash, K)) so one giant
    language never serializes on a single task — bins never span
    shards, every shard is independently exact and deterministic
    (identity-hash sharding, engine- and partitioning-invariant), and
    K scales the recurrence to the cluster. Padding overhead rises only
    marginally (one partially-filled final bin per shard instead of one
    per key)."""
    import pandas as pd

    from pyspark.sql import types as T

    sel = df.select(id_col, key_col, token_col)
    group_cols = [key_col]
    if shards is not None:
        sel = sel.withColumn(
            "_shard",
            (F.col(id_col).cast("long") * F.lit(2654435761))
            % F.lit(4294967296)
            % shards,
        )
        group_cols.append("_shard")
    out_schema = T.StructType(
        list(sel.schema.fields) + [T.StructField("pack_id", T.IntegerType())]
    )

    def _pack(pdf):
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        acc, pid, ids = 0, 0, []
        for tok in pdf[token_col]:
            tok = int(tok)
            if acc > 0 and acc + tok > capacity:
                pid, acc = pid + 1, 0
            acc += tok
            ids.append(pid)
        return pdf.assign(pack_id=pd.Series(ids, dtype="int32"))

    return sel.groupBy(*group_cols).applyInPandas(_pack, schema=out_schema)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, int],
    default_pct: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling: keep `rates[stratum]` percent
    of each stratum (class rebalancing — e.g. downsample the dominant
    language). Uses the same identity-hash bucket as train_val_test, so
    the selection is reproducible across runs/engines/partitionings —
    sampleBy() cannot promise that (per-partition seeds). A row is kept
    iff bucket(id) < pct(stratum); strata not in `rates` fall back to
    default_pct."""
    b = split_bucket(F.col(id_col))
    pct = F.lit(default_pct)
    for stratum, p in sorted(rates.items()):
        pct = F.when(F.col(strata_col) == stratum, p).otherwise(pct)
    return df.filter(b < pct)


def identity_hash(id_col: Column) -> Column:
    """Knuth multiplicative hash of a numeric id into [0, 2^32) — the
    same pure-integer mix `split_bucket` cuts percentages from. Used as
    a deterministic pseudo-random ORDER (shuffling, per-key caps) that
    any engine reproduces exactly; ties are impossible only modulo the
    hash, so consumers must tie-break on the id itself."""
    return (id_col.cast("long") * F.lit(2654435761)) % F.lit(4294967296)


def per_key_cap(
    df: DataFrame, key_col: str, cap: int, id_col: str = "doc_id"
) -> DataFrame:
    """Per-key document cap (the RefinedWeb-style per-domain limit):
    keep at most `cap` rows per `key_col`, chosen by identity-hash
    order so the survivors are a deterministic pseudo-random sample —
    not "first cap by insertion order", which would bias toward old
    crawls, and not `rand()`, which repartitioning reshuffles. Adds
    `keep_rank` (1-based within key).

    Scale: one shuffle on the key; the window never materializes a
    whole key on the driver. A pathologically hot key is still one
    task's sort — at 100 TB pre-filter hot keys with the same
    identity-hash trick (keep iff bucket(id) < cap/est_count*100,
    over-admitting slightly) before the exact window pass, so the sort
    input per key is O(cap), not O(|key|)."""
    w = Window.partitionBy(key_col).orderBy(
        identity_hash(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("keep_rank", F.row_number().over(w))
        .filter(F.col("keep_rank") <= cap)
    )


def shard_shuffle(
    df: DataFrame, id_col: str = "doc_id", shards: int = 8
) -> DataFrame:
    """Deterministic global corpus shuffle, sharded: assign every row an
    identity-hash shuffle key, route it to `hash % shards`, and number
    rows within each shard in hash order — the reproducible
    shuffled-training-order layout (shard files, each internally
    ordered; reading shards round-robin replays the same global
    pseudo-random order on every run of any engine). `rand()` ordering
    can't be replayed; a single global `row_number` would serialize on
    one task.

    Scale: `shards` is the write parallelism — one shuffle routes rows
    to shards, each shard sorts independently (O(n/K log n/K) per
    task). At 100 TB set shards = O(output files); determinism is
    partitioning-proof by construction (pure function of the id)."""
    h = identity_hash(F.col(id_col))
    out = df.withColumn("shard", (h % shards).cast("int"))
    w = Window.partitionBy("shard").orderBy(h, F.col(id_col))
    return out.withColumn("pos", F.row_number().over(w))


def nucleus_select(
    df: DataFrame,
    score_col: str,
    token_col: str,
    group_col: str,
    p: float = 0.8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group top-p ("nucleus") corpus selection: rank documents by
    quality score (descending, id tiebreak) and keep the best prefix
    whose token mass stays under p · group_total — the mixture-building
    step that caps each domain at its token budget while preferring its
    best documents (quality-pruned data mixtures). A doc is kept iff the
    cumulative token count BEFORE it is under the budget, so the doc
    that crosses the line is included and every group keeps ≥ 1 doc.

    Determinism: score and token counts are exact integers, the
    cumulative sum is a bigint window over a total order (score desc,
    id), and the only float op is the single p·total compare —
    identical operands in any engine.

    Scale: one shuffle on the group key + a per-group sort (the same
    envelope as shard_shuffle); domains far larger than a task should
    pre-prune with a score-histogram threshold (two cheap aggregates)
    before the exact windowed pass."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(score_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(group_col)
    return (
        df.withColumn("cum_tokens", F.sum(token_col).over(w))
        .withColumn("_total", F.sum(token_col).over(wall))
        .filter(
            (F.col("cum_tokens") - F.col(token_col))
            < F.lit(p) * F.col("_total")
        )
        .select(group_col, id_col, score_col, token_col, "cum_tokens")
    )


def weighted_priority_sample(
    df: DataFrame, weight_col: str, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via priority sampling
    (Duffield-Lund-Thorup): every row gets priority w / u with u a
    per-row uniform, and the sample is the global top-k by priority.
    Heavier rows surface more often, each row appears at most once,
    and — unlike sequential reservoir algorithms — the selection is a
    pure per-row score + top-k, so it parallelizes over any partitioning
    (the reference's generator samples with Python `random`, one row at
    a time — generate_data.py:110-114).

    Determinism (cross-engine oracle-exact): u is the identity hash
    shifted to [1, 2^32] and the priority is ONE IEEE-754 division of
    exact integer-valued doubles — division is correctly rounded, so
    Spark and DuckDB produce bit-identical priorities; ties (only
    possible via hash collision) break on the id.

    Scale: `orderBy().limit(k)` plans as TakeOrderedAndProject — a
    per-partition heap of k rows + a driver merge of partitions×k, never
    a global sort. At 100 TB the cost is the scan; the sample never
    shuffles."""
    pr = F.col(weight_col).cast("double") / (
        (identity_hash(F.col(id_col)) + F.lit(1)).cast("double")
    )
    return (
        df.withColumn("priority", pr)
        .orderBy(F.col("priority").desc(), F.col(id_col))
        .limit(k)
    )
