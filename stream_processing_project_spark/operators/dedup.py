"""Deduplication operators for training-data pipelines: exact, n-gram
Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Beyond the reference's surface (BASELINE.json north star). Scale design:
  * exact dedup is a hash-groupBy — one shuffle on the fingerprint;
  * n-gram Jaccard prunes frequent shingles before the candidate join
    (a shingle shared by >max_df docs generates O(df²) candidate pairs —
    the stop-shingle cap is what keeps the join quadratic-free at 100 TB);
  * MinHash+LSH replaces the all-pairs comparison with banded signature
    buckets: only same-bucket pairs are compared, and signatures are
    built with array aggregates (no per-permutation shuffle);
  * SimHash buckets 64-bit sketches by 16-bit bands for Hamming search.

All token/signature work uses codegen'd higher-order functions; the only
shuffles are the groupBys/joins on doc or bucket keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stream_processing_project_spark.operators.text import fingerprint


def exact_dedup_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup summary per lang: total docs, distinct contents, dups
    (dup key = md5 of normalized text)."""
    return (
        docs.withColumn("fp", fingerprint(F.col(text_col)))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_dups"),
        )
    )


def exact_dedup_keep_first(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup keeping the lowest doc_id per content fingerprint —
    the canonical keep-first policy. One shuffle on fp; min() instead of
    row_number so the aggregation stays partial-aggregatable."""
    keep = (
        docs.withColumn("fp", fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    return docs.join(keep, "doc_id", "left_semi")


def _ngrams(df: DataFrame, text_col: str = "text", n: int = 2) -> DataFrame:
    """doc_id → exploded DISTINCT word-n-gram shingles. Docs with <n
    tokens are dropped (Spark's sequence(1,0) counts DOWN rather than
    returning empty — the filter keeps parity with SQL generate_series).
    The token array is materialized once per row before the transform:
    inlining split() into the lambda re-tokenizes the document per
    shingle index (O(tokens²) string work in the hot path)."""
    parts = ", ".join(f"element_at(_toks, i + {j})" for j in range(n))
    return (
        df.withColumn("_toks", F.split(F.trim(F.col(text_col)), " "))
        .filter(F.size("_toks") >= n)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, size(_toks) - {n - 1}),"
                        f" i -> concat_ws(' ', {parts}))"
                    )
                )
            ).alias("sh"),
        )
    )


def _bigrams(df: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id → exploded DISTINCT word-bigram shingles (the MinHash /
    ngram-Jaccard family's shingle grain)."""
    return _ngrams(df, text_col, 2)


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.2,
    max_df: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Near-dup candidate pairs by exact bigram-set Jaccard, computed over
    the capped shingle sets (shingles with document frequency > max_df are
    dropped before the join — the scalability lever; Jaccard is then
    |common| / (|a| + |b| − |common|) over the SAME capped sets, a raw
    integer quotient so it is engine-deterministic)."""
    sh = _bigrams(docs, text_col).persist()
    rare = sh.join(
        sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") <= max_df),
        "sh",
        "left_semi",
    ).persist()
    # persist: the shingle pipeline feeds four branches (df-cap, sizes,
    # both join sides) — without it each branch re-tokenizes the corpus.
    # At 100 TB persist the CAPPED set (post-prune, much smaller) to
    # durable storage instead of executor memory.
    # sizes is consumed by BOTH verify joins (renamed n_a / n_b), and the
    # rename defeats exchange reuse — without the pin the |rare|-row
    # aggregation pass runs twice (r12; Exchange mentions 11 -> 8 in the
    # plan dump). Lazy: |docs| slim rows, computed at first action.
    sizes = (
        rare.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
        .localCheckpoint(eager=False)
    )
    a = rare.select(F.col("doc_id").alias("doc_a"), "sh")
    b = rare.select(F.col("doc_id").alias("doc_b"), "sh")
    common = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard")
    )


def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    threshold_num: int = 7,
    threshold_den: int = 10,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """EXACT Jaccard similarity join with LOSSLESS prefix filtering
    (Chaudhuri et al. SSJoin / Bayardo et al. AllPairs) — the
    linkage/dedup family's missing scale rung between the lossy
    stop-shingle cap (ngram_jaccard_pairs drops shingles with df >
    max_df, losing any pair that only overlaps on common shingles) and
    the probabilistic MinHash-LSH (bounded recall): order every
    document's shingles by a GLOBAL total order (corpus document
    frequency asc, shingle — rarest first), keep only the first
    L − ⌈t·L⌉ + 1 per document, and equi-join on those prefix shingles.
    Pigeonhole guarantees completeness: if J(a,b) ≥ t, the prefixes
    must intersect under any shared total order — so after the exact
    verify the result EQUALS the brute-force all-pairs join (pinned in
    tests), while the candidate join touches only the rare end of each
    document's shingle list (the frequent shingles that drive the df²
    blowup never enter the join). Shingle grain is word n-grams (n=3
    default): prefix filtering needs a RARE TAIL to prune with, and on
    this fixture's 31-word vocabulary bigram document frequencies are
    corpus-sized (measured: the bigram variant spent 57 s at sf0.1 on a
    ~23M-pair candidate set; trigrams have median df = 1 and prune to
    the planted near-dups) — the same reason production near-dup
    pipelines shingle at 3-5 words.

    All decisions are exact integers: the prefix length uses
    ⌈t·L⌉ = (num·L + den − 1) div den and the verify keeps pairs with
    den·|∩| ≥ num·(|a| + |b| − |∩|) — no float thresholds anywhere, so
    the result value-hash-oracles. Output: (doc_a, doc_b, n_common,
    n_a, n_b) over the FULL (uncapped) shingle sets.

    Scale shape: one shingle checkpoint feeds the df census, the
    per-doc prefix rank (doc-keyed window), the candidate equi-join and
    the verify joins; candidate volume is Σ over PREFIX shingles of
    df² — tunable by threshold and shingle grain, not by a lossy
    cap."""
    sh = _ngrams(docs, text_col, n).localCheckpoint(eager=True)
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    wdoc = Window.partitionBy("doc_id")
    ranked = (
        sh.join(dfreq, "sh")
        .select(
            "doc_id",
            "sh",
            F.row_number()
            .over(wdoc.orderBy("df", "sh"))
            .alias("rk"),
            F.count(F.lit(1)).over(wdoc).alias("L"),
        )
    )
    prefix = ranked.filter(
        F.col("rk")
        <= F.col("L")
        - F.expr(f"({threshold_num} * L + {threshold_den} - 1) div {threshold_den}")
        + 1
    ).select("doc_id", "sh")
    cand = (
        prefix.select(F.col("doc_id").alias("doc_a"), "sh")
        .join(prefix.select(F.col("doc_id").alias("doc_b"), "sh"), "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "sh"), "doc_a")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "sh"),
            ["doc_b", "sh"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_sh"))
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")),
            "doc_b",
        )
        .filter(
            F.lit(threshold_den) * F.col("n_common")
            >= F.lit(threshold_num) * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        )
        .select("doc_a", "doc_b", "n_common", "n_a", "n_b")
    )


# --- MinHash + LSH -----------------------------------------------------------

N_PERM = 32
BAND_ROWS = 4  # 8 bands × 4 rows


_MERSENNE31 = 2_147_483_647


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id → 32-permutation MinHash signature over bigram shingles.

    CROSS-ENGINE REPRODUCIBLE (r08, VERDICT r07 task 6): the shingle
    base hash is the first 15 hex chars of md5(shingle) as a 60-bit
    bigint reduced mod 2^31-1 — which DuckDB computes identically as
    ('0x' || substr(md5(..), 1, 15))::BIGINT — and the 32 permutations
    are affine maps of that base (the md5_minhash_bands idiom below,
    incl. the per-perm shift that keeps near-zero bases from winning
    every perm at once). Pipelines built on these signatures therefore
    carry full value-hash oracles, where the previous xxhash64(sh, p)
    signatures could only be rows-only checked.

    Plan shape: the base md5 is hashed ONCE per shingle, then
    repartition(doc_id) acts as both the alias-inlining barrier (the
    md5_minhash_bands lesson: without it Catalyst inlines the md5 into
    the 32-perm lambda and re-hashes 32×) and the aggregation exchange
    — the groupBy reuses the same hash distribution, so the barrier
    costs no extra shuffle. The signature is an element-wise array min
    in a single groupBy — no explode of permutations."""
    m = _MERSENNE31
    sh = _bigrams(docs, text_col).select(
        "doc_id",
        F.expr(
            f"CAST(conv(substr(md5(sh), 1, 15), 16, 10) AS BIGINT) % {m}"
        ).alias("h"),
    ).repartition(F.col("doc_id"))
    hashes = F.expr(
        f"transform(sequence(0, {N_PERM - 1}), p -> "
        f"(((h + CAST(p + 1 AS BIGINT) * 1122334455) % {m})"
        f" * ((2654435761 * CAST(p + 1 AS BIGINT)) % {m})"
        f" + (40503 * (CAST(p AS BIGINT) + 7)) % {m}) % {m})"
    )
    return (
        sh.withColumn("hs", hashes)
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.collect_list("hs"),
                F.expr(f"array_repeat(cast(9223372036854775807 AS bigint), {N_PERM})"),
                lambda acc, x: F.zip_with(acc, x, lambda a, b: F.least(a, b)),
            ).alias("sig")
        )
    )


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """LSH candidate pairs: signatures banded 8×4; docs sharing any band
    bucket are candidates; estimated Jaccard = matching signature
    positions / 32, thresholded. Fully deterministic cross-engine (r08):
    signatures are the md5-affine family and band keys are md5 digests
    of the comma-joined signature slice, so the registered
    dedup_minhash_lsh query carries a full DuckDB value-hash oracle
    (previously rows-only); unit tests additionally pin known
    duplicates.

    Plan shape for scale: signatures are computed ONCE and persisted
    (|docs| × 32 longs — tiny next to the corpus), the band self-join
    carries only (doc_id, band) pairs, candidate pairs dedupe on bare
    ids, and signatures re-attach at the end. Without this the self-join
    recomputes the whole shingle pipeline per branch and dedupes on
    32-element arrays — ~40× slower at bench scale.
    """
    sigs = minhash_signatures(docs).persist()
    n_bands = N_PERM // BAND_ROWS
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}),"
                f" b -> md5(concat_ws(',', transform(slice(sig,"
                f" b * {BAND_ROWS} + 1, {BAND_ROWS}),"
                f" x -> CAST(x AS STRING)))))"
            )
        ).alias("band_idx", "band_hash"),
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    est = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    ) / F.lit(N_PERM)
    return (
        cand.join(sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")), "doc_a")
        .join(sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")), "doc_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def md5_minhash_bands(
    docs: DataFrame,
    text_col: str = "text",
    perms: int = 16,
    band_rows: int = 4,
) -> DataFrame:
    """doc_id → (band_idx, band_hash) LSH band rows from a CROSS-ENGINE
    REPRODUCIBLE MinHash: the shingle's base hash is the first 15 hex
    chars of md5(shingle) as a 60-bit bigint — which DuckDB computes
    identically as ('0x' || substr(md5(..), 1, 15))::BIGINT — and the
    permutations are affine maps of that base mod 2^31-1. Unlike the
    xxhash64 signatures above (rows-only checked), pipelines built on
    these bands carry full value-hash oracles.

    Row-LOCAL (no aggregation): the whole signature folds inside one
    projection over the document's own shingle array, which is what
    lets a STREAM compute it per arriving document without a stateful
    shuffle. Docs with < 2 words produce no band rows (always kept)."""
    n_bands = perms // band_rows
    # One md5 per shingle; the `perms` permutations are affine maps of
    # that 60-bit base modulo the Mersenne prime 2^31-1 (operands stay
    # under 2^62 — no bigint overflow, so identical under ANSI mode and
    # in DuckDB). 16x fewer md5 calls than hashing (shingle, p) pairs.
    # The per-perm SHIFT before the multiply matters: without it, a
    # shingle whose base lands near 0 maps to a tiny value under EVERY
    # perm at once (value = B_p << m), wins every minimum, and two docs
    # sharing one such shingle collide in all bands — measured 4x
    # false-positive inflation. Shifting moves each perm's danger zone
    # to a different base region, restoring per-perm independence.
    m = 2_147_483_647
    sig = (
        f"transform(sequence(0, {perms - 1}), p -> "
        f"array_min(transform(hs, h -> "
        f"(((h + CAST(p + 1 AS BIGINT) * 1122334455) % {m})"
        f" * ((2654435761 * (p + 1)) % {m})"
        f" + (40503 * (p + 7)) % {m}) % {m})))"
    )
    bands = (
        f"transform(sequence(0, {n_bands - 1}), b -> "
        f"md5(concat_ws(',', transform(slice(sig, b * {band_rows} + 1,"
        f" {band_rows}), x -> CAST(x AS STRING)))))"
    )
    return (
        docs.selectExpr("doc_id", f"split(trim({text_col}), ' ') AS ws")
        .filter("size(ws) >= 2")
        .selectExpr(
            "doc_id",
            "array_distinct(transform(sequence(1, size(ws) - 1),"
            " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))))"
            " AS shingles",
        )
        .selectExpr(
            "doc_id",
            "transform(shingles, sh -> "
            "CAST(conv(substr(md5(sh), 1, 15), 16, 10) AS BIGINT)"
            f" % {m}) AS hs",
        )
        # Exchange barrier: without it the hs projection alias-inlines
        # into the 16-perm transform and the md5 pass re-evaluates 16x
        # (measured: sig cost == 16 x hs cost). The shuffle carries
        # |docs| rows of ~50 longs — trivial next to the recompute.
        .repartition(F.col("doc_id"))
        .selectExpr("doc_id", f"{sig} AS sig")
        .selectExpr("doc_id", f"posexplode({bands}) AS (band_idx, band_hash)")
    )


def minhash_lsh_cross_pairs(
    batch: DataFrame, corpus: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Incremental near-dup: LSH candidates BETWEEN a new batch and an
    existing corpus (new_id, corpus_id, est_jaccard) — the band join
    replaces `minhash_lsh_pairs`'s self-join, so the corpus is never
    paired with itself. This is the continuous-ingest shape: at 100 TB
    the corpus's signatures/bands are a PRECOMPUTED table (|corpus| × 32
    longs, maintained alongside the data), each increment computes
    signatures for the batch only, and the band join broadcasts the
    small batch side against the corpus band table — per-increment cost
    scales with the batch, not the corpus.
    """
    bsigs = minhash_signatures(batch).persist()
    csigs = minhash_signatures(corpus).persist()
    n_bands = N_PERM // BAND_ROWS
    band_expr = F.posexplode(
        F.expr(
            f"transform(sequence(0, {n_bands - 1}),"
            f" b -> md5(concat_ws(',', transform(slice(sig,"
            f" b * {BAND_ROWS} + 1, {BAND_ROWS}), x -> CAST(x AS STRING)))))"
        )
    ).alias("band_idx", "band_hash")
    bbands = bsigs.select(F.col("doc_id").alias("new_id"), band_expr)
    cbands = csigs.select(F.col("doc_id").alias("corpus_id"), band_expr)
    cand = (
        cbands.join(F.broadcast(bbands), ["band_idx", "band_hash"])
        .select("new_id", "corpus_id")
        .distinct()
    )
    est = F.size(
        F.filter(
            F.zip_with(
                F.col("sig_new"), F.col("sig_corpus"), lambda x, y: (x == y).cast("int")
            ),
            lambda v: v == 1,
        )
    ) / F.lit(N_PERM)
    return (
        cand.join(
            bsigs.select(F.col("doc_id").alias("new_id"), F.col("sig").alias("sig_new")),
            "new_id",
        )
        .join(
            csigs.select(
                F.col("doc_id").alias("corpus_id"), F.col("sig").alias("sig_corpus")
            ),
            "corpus_id",
        )
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("new_id", "corpus_id", "est_jaccard")
    )


# --- SimHash ------------------------------------------------------------------


def simhash_bits(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id → 64-element 0/1 array: sign of the per-bit vote over a
    CROSS-ENGINE 64-bit md5 token hash — bits 0-59 from the first 15
    hex chars of md5(token) as a bigint, bits 60-63 from the 16th hex
    char — of every (distinct-position) token. r08 (VERDICT r07 task
    6): md5 replaces the xxhash64 token hash so simhash pipelines
    value-hash-oracle in DuckDB (('0x' || substr(md5(w), 1, 15))::BIGINT
    reproduces conv() exactly). The token-hash projection materializes
    behind a repartition(doc_id) barrier — the md5_minhash_bands
    alias-inlining lesson: collapsed into one projection, the md5
    re-evaluates 64× per token inside the per-bit vote lambda."""
    hp = (
        docs.select(
            "doc_id", F.split(F.trim(F.col(text_col)), " ").alias("_toks")
        )
        .select(
            "doc_id",
            F.expr(
                "transform(_toks, w -> array("
                "CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT),"
                " CAST(conv(substr(md5(w), 16, 1), 16, 10) AS BIGINT)))"
            ).alias("th"),
        )
        .repartition(F.col("doc_id"))
    )
    bits = F.expr(
        "transform(sequence(0, 63), j -> CASE WHEN aggregate(th, 0L,"
        " (acc, x) -> acc + CASE WHEN (shiftright("
        "CASE WHEN j < 60 THEN element_at(x, 1) ELSE element_at(x, 2) END,"
        " CAST(CASE WHEN j < 60 THEN j ELSE j - 60 END AS INT)) & 1) = 1"
        " THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END)"
    )
    return hp.select("doc_id", bits.alias("bits"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming, found via band
    buckets. Band count is DERIVED from the budget: a pair differing in
    ≤ max_hamming bits must share at least one of max_hamming+1 bands
    untouched (pigeonhole), so recall within the budget is structural,
    not probabilistic — r01's fixed 4×16 banding silently missed
    Hamming-4..6 pairs. Narrower bands mean coarser buckets
    (64/(h+1) bits → 2^(64/(h+1)) buckets): the honest scale tradeoff
    is candidate volume ∝ n²/2^bandwidth per band, so keep max_hamming
    small at corpus scale (Manku et al.'s 3-bit budget keeps 16-bit
    bands). Fully deterministic cross-engine (r08): bits come from the
    md5 token hash and band keys are the bit-slice rendered as a 0/1
    string, so the registered dedup_simhash query carries a full DuckDB
    value-hash oracle (previously rows-only); the containment companion
    (dedup_simhash_containment) stays as the recall gate."""
    n_bands = max_hamming + 1
    width = 64 // n_bands  # last band absorbs the remainder
    sigs = simhash_bits(docs).persist()
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}),"
                f" b -> concat_ws('', transform(slice(bits, b * {width} + 1,"
                f" CASE WHEN b = {n_bands - 1} THEN 64 ELSE {width} END),"
                f" x -> CAST(x AS STRING))))"
            )
        ).alias("band_idx", "band_hash"),
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    hamming = F.size(
        F.filter(
            F.zip_with(F.col("bits_a"), F.col("bits_b"), lambda x, y: x != y),
            lambda v: v,
        )
    )
    return (
        cand.join(sigs.select(F.col("doc_id").alias("doc_a"), F.col("bits").alias("bits_a")), "doc_a")
        .join(sigs.select(F.col("doc_id").alias("doc_b"), F.col("bits").alias("bits_b")), "doc_b")
        .withColumn("hamming", hamming.cast("bigint"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    method: str = "propagate",
) -> DataFrame:
    """Resolve near-dup candidate pairs into duplicate clusters:
    (doc_id, cluster_id) for every document that appears in a pair,
    cluster_id = the minimum doc_id in its connected component — the
    step that turns pairwise similarity output into a keep-one-per-
    cluster decision.

    method="propagate" (default): min-label propagation to a fixpoint —
    each round every node takes the minimum of its own label and its
    neighbors' labels; converges in diameter(component) rounds (near-dup
    components are shallow — dup clusters, not social graphs). Each
    round is one shuffle of (node, label) against the edge list; lineage
    is truncated per round with localCheckpoint so plans stay flat.

    method="star": alternating large-star/small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014) — edge
    rewriting that converges in O(log² n) rounds REGARDLESS of diameter.
    Use for high-diameter graphs (chains of pairwise-similar documents)
    where propagation would need diameter rounds. Same output contract.
    """
    if method == "star":
        return _connected_components_star(pairs, src, dst, max_iter)
    pairs = pairs.persist()  # the union below reads the pair pipeline twice
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("node")).distinct().withColumn("label", F.col("node"))
    )
    converged = False
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("u", "node")
        )
        new_labels = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter) — returning partial labels "
            "would silently split clusters; raise max_iter or switch to "
            "large-star/small-star"
        )
    pairs.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def _connected_components_star(
    pairs: DataFrame,
    src: str,
    dst: str,
    max_iter: int,
) -> DataFrame:
    """Large-star/small-star connected components.

    Each round rewrites the edge set:
      * large-star — per node u over its SYMMETRIC neighborhood, connect
        every strictly-larger neighbor to m = min(Γ(u) ∪ {u});
      * small-star — orient every edge max→min, then per node u connect
        its (all smaller) neighbors and u itself to m = min(Γ(u) ∪ {u}).
    Both are one groupBy + one equi-join per round; edge count never
    grows beyond the input, and the graph collapses into stars
    (node → component-min) in O(log² n) rounds independent of diameter.
    Convergence is detected by an order-insensitive edge-set signature
    (count + sum of pair hashes) — one cheap aggregate, no set diff.
    Per-round localCheckpoint keeps plans flat, as in the propagation
    path."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        .distinct()
        .localCheckpoint()
    )

    def signature(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: a long sum of 2^63-range hashes
            # overflows under ANSI mode
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        m = sym.groupBy("u").agg(F.min("v").alias("mn"))
        m = m.select("u", F.least("u", "mn").alias("m"))
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        d = e.select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        m = d.groupBy("u").agg(F.min("v").alias("m"))
        nbr = (
            d.join(m, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        own = d.join(m, "u").select(F.col("u").alias("a"), F.col("m").alias("b"))
        return nbr.union(own).filter(F.col("a") != F.col("b")).distinct()

    sig = signature(edges)
    converged = False
    for _ in range(max_iter):
        edges = small_star(large_star(edges)).localCheckpoint()
        new_sig = signature(edges)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        raise RuntimeError(
            f"star connected_components did not converge in {max_iter} rounds"
        )
    # Fixpoint edges form stars (node, root). Every non-root node appears
    # as `a` with its root as `b`; roots label themselves.
    nodes = (
        pairs.select(F.col(src).alias("node"))
        .union(pairs.select(F.col(dst).alias("node")))
        .distinct()
    )
    root_of = edges.groupBy(F.col("a").alias("node")).agg(
        F.min("b").alias("cluster_id")
    )
    return nodes.join(root_of, "node", "left").select(
        F.col("node").alias("doc_id"),
        F.coalesce("cluster_id", "node").alias("cluster_id"),
    )


def incremental_dedup(
    new_docs: DataFrame, corpus: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Incremental exact dedup — the production shape: drop new documents
    whose content already exists in the historical corpus (left-anti on
    the content fingerprint), then dedup within the new batch itself
    (keep lowest doc_id). The corpus side reduces to DISTINCT
    fingerprints before the join — at 100 TB that dedup table is the
    thing you persist between pipeline runs (bucketed by fp), so each
    increment joins against fingerprints, never documents."""
    seen = corpus.select(
        fingerprint(F.col(text_col)).alias("fp")
    ).distinct()
    fresh = (
        new_docs.withColumn("fp", fingerprint(F.col(text_col)))
        .join(seen, "fp", "left_anti")
    )
    keep = fresh.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return fresh.join(keep, ["fp", "doc_id"], "left_semi").drop("fp")
