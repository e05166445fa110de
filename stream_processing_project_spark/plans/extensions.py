"""Training-data-pipeline extension queries: dedup, similarity search,
text analysis, multimodal plumbing, and the vectorized-UDF surface
(SURVEY.md §2.7, §7 M4; BASELINE.json north star).

Sketch oracling (r08, VERDICT r07 task 6): MinHash LSH, SimHash and
winnowing now use cross-engine md5-derived hashes, so their raw sketch
output carries FULL DuckDB value-hash oracles (dedup_minhash_lsh,
dedup_simhash, text_winnow_candidates), on top of the fully-oracled
containment companions that semi-join exact near-dup pairs against each
sketch's candidates (dedup_minhash_containment,
dedup_simhash_containment, text_winnow_containment). As of r10 (VERDICT
r09 task 1) ZERO rows-only queries remain: the two GEMM ANN builds
(similarity_ann_lsh, similarity_ann_ivf) now run their vectorized
Arrow-batched builds over EXACT int64 arithmetic — quantized vectors
keep every matmul entry below 2^48, so int64 GEMM is exact — making
their outputs bit-identical to the ANSI-SQL expression twins; every
registered name carries a full DuckDB value-hash oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stream_processing_project_spark.operators import dedup, multimodal, similarity
from stream_processing_project_spark.operators.text import (
    BPE_ISH_RE,
    PUNCT_RE,
    STOPWORDS,
    fingerprint,
    lang_guess,
    prefix_fingerprint,
    quality_features,
)
from stream_processing_project_spark.plans.common import t
from stream_processing_project_spark.plans.registry import register

_SW_EN = ", ".join(f"'{w}'" for w in STOPWORDS["en"])


# =========================== text analysis ===================================


TEXT_QUALITY_ORACLE = f"""
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_chars,
       CAST(len(string_split(trim(text), ' ')) AS INTEGER) AS n_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_ISH_RE}')) AS INTEGER) AS n_bpe_tokens,
       length(text) / len(string_split(trim(text), ' ')) AS avg_token_len,
       len(regexp_extract_all(text, '{PUNCT_RE}')) / length(text) AS punct_ratio,
       len(list_filter(string_split(trim(text), ' '), w -> w IN ({_SW_EN})))
         / len(string_split(trim(text), ' ')) AS stopword_ratio,
       CASE WHEN len(string_split(trim(text), ' ')) BETWEEN 10 AND 100000
              AND len(list_filter(string_split(trim(text), ' '), w -> w IN ({_SW_EN}))) > 0
            THEN 1 ELSE 0 END AS quality_keep
FROM documents
"""


@register("text_quality", oracle=TEXT_QUALITY_ORACLE, tags=("bench",))
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring features per document — pretraining-filter style
    (length/punct/stopword ratios, keep flag); all codegen'd array ops."""
    return quality_features(t(spark, sf_dir, "documents"))


@register(
    "text_langid",
    oracle=f"""
SELECT doc_id, lang,
       CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
            WHEN en >= de AND en >= es AND en >= fr AND en > 0 THEN 'en'
            WHEN de >= es AND de >= fr AND de > 0 THEN 'de'
            WHEN es >= fr AND es > 0 THEN 'es'
            WHEN fr > 0 THEN 'fr'
            ELSE 'unknown' END AS lang_guess
FROM (
  SELECT doc_id, lang, text,
         len(list_filter(string_split(trim(text), ' '), w -> w IN ({_SW_EN}))) AS en,
         len(list_filter(string_split(trim(text), ' '), w -> w IN ({", ".join(f"'{w}'" for w in STOPWORDS["de"])}))) AS de,
         len(list_filter(string_split(trim(text), ' '), w -> w IN ({", ".join(f"'{w}'" for w in STOPWORDS["es"])}))) AS es,
         len(list_filter(string_split(trim(text), ' '), w -> w IN ({", ".join(f"'{w}'" for w in STOPWORDS["fr"])}))) AS fr
  FROM documents
)
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic n-gram/stopword language ID (CJK script check + stopword
    argmax with fixed tie order)."""
    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", lang_guess(F.col("text")).alias("lang_guess"))


@register(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       md5(lower(trim(text))) AS fp,
       md5(concat(substr(lower(trim(text)), 1, 64), ':',
                  CAST(CAST(floor(length(text) / 100) AS BIGINT) AS VARCHAR))) AS prefix_fp
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact content hash + prefix/length-bucket
    rolling-style hash (near-dup prefilter)."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fp"),
        prefix_fingerprint(F.col("text")).alias("prefix_fp"),
    )


@register(
    "text_token_stats",
    oracle=f"""
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS total_tokens,
       CAST(sum(len(regexp_extract_all(text, '{BPE_ISH_RE}'))) AS BIGINT) AS total_bpe_tokens
FROM documents
GROUP BY lang
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per language — the budget query every
    training-data pipeline runs first."""
    from stream_processing_project_spark.operators.text import (
        bpe_ish_token_count,
        token_count,
    )

    docs = t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("long")).alias("total_tokens"),
        F.sum(bpe_ish_token_count(F.col("text")).cast("long")).alias("total_bpe_tokens"),
    )


@register(
    "text_repetition",
    oracle="""
WITH bi AS (
  SELECT doc_id, ws,
         list_transform(generate_series(1, len(ws) - 1),
                        i -> concat(ws[i], ' ', ws[i + 1])) AS b
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents)
  WHERE len(ws) >= 2
),
feat AS (
  SELECT doc_id,
         CAST(len(ws) AS INTEGER) AS n_tokens,
         (len(ws) - len(list_distinct(ws))) / len(ws) AS dup_word_frac,
         CAST(list_max(list_transform(list_distinct(b),
                d -> len(list_filter(b, x -> x = d)))) AS INTEGER) AS top_bigram_count,
         list_max(list_transform(list_distinct(b),
                d -> len(list_filter(b, x -> x = d)))) / len(b) AS top_bigram_frac
  FROM bi
)
SELECT doc_id, n_tokens, dup_word_frac, top_bigram_count, top_bigram_frac,
       CASE WHEN dup_word_frac <= 0.95 AND top_bigram_frac <= 0.1
            THEN 1 ELSE 0 END AS repetition_keep
FROM feat
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters: duplicate-word fraction
    and most-common-bigram fraction with a keep flag — all inline array
    ops (no explode, no shuffle)."""
    from stream_processing_project_spark.operators.text import repetition_features

    return repetition_features(t(spark, sf_dir, "documents"))


TEXT_CHUNK_ORACLE = """
SELECT doc_id,
       CAST(s AS INTEGER) AS chunk_start,
       CAST(s // 24 AS INTEGER) AS chunk_id,
       CAST(least(32, len(ws) - s) AS INTEGER) AS n_chunk_tokens,
       array_to_string(list_slice(ws, s + 1, s + 32), ' ') AS chunk_text
FROM (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
     unnest(generate_series(0, greatest(len(ws) - 9, 0), 24)) AS u(s)
"""


@register("text_chunk", oracle=TEXT_CHUNK_ORACLE)
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 32-token chunks advancing by 24 (8-token
    overlap), final fully-contained fragments suppressed — the packing
    primitive between dedup/quality filtering and tokenization."""
    from stream_processing_project_spark.operators.text import chunk_documents

    return chunk_documents(t(spark, sf_dir, "documents"))


@register(
    "text_decontaminate",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, len(ws) - 12),
           i -> array_to_string(ws[i:i+12], ' ')))) AS g
  FROM toks WHERE len(ws) >= 13
)
SELECT c.doc_id, count(*) AS n_hit_grams
FROM (SELECT * FROM grams WHERE doc_id % 17 <> 0) c
JOIN (SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 0) b USING (g)
GROUP BY c.doc_id
""",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any 13-token gram
    with the 'benchmark' slice (doc_id % 17 == 0 stands in for a held-out
    eval set). Gram hashes broadcast from the small benchmark side; the
    oracle joins the gram STRINGS — hash-collision-free ground truth the
    hashed plan must reproduce."""
    from stream_processing_project_spark.operators.text import decontaminate

    docs = t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    benchmark = docs.filter(F.col("doc_id") % 17 == 0)
    return decontaminate(corpus, benchmark, n=13)


@register(
    "text_tfidf_top_terms",
    oracle="""
WITH tf AS (
  SELECT doc_id, w AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM documents)
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM documents)
SELECT doc_id, term, tf, df, score, CAST(rank AS INTEGER) AS rank FROM (
  SELECT t.doc_id, t.term, t.tf, d.df,
         t.tf * n.n / d.df AS score,
         row_number() OVER (PARTITION BY t.doc_id
                            ORDER BY t.tf * n.n / d.df DESC, t.term) AS rank
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
) WHERE rank <= 3
""",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf-idf with a LINEAR
    idf (tf × N / df): log-idf would rank identically (log is monotone)
    but its libm rounding differs across engines, so the linear variant
    keeps the oracle exact. Two partial-agg shuffles (term counts, doc
    frequencies) + a broadcast scalar N — no quadratic work."""
    from stream_processing_project_spark.operators.text import words as _words

    docs = t(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(_words(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.col("tf") * F.col("n") / F.col("df"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


@register(
    "retrieval_bm25_topk",
    oracle="""
WITH tok AS (
  SELECT doc_id, len(string_split(trim(text), ' ')) AS dl,
         unnest(string_split(trim(text), ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, max(dl) AS dl, count(*) AS tf
  FROM tok GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
qterms AS (SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT 8),
stats AS (
  SELECT count(*) AS n,
         avg(len(string_split(trim(text), ' '))) AS avgdl
  FROM documents
),
scored AS (
  SELECT t.doc_id,
         CAST(round(ln(1 + (s.n - q.df + 0.5) / (q.df + 0.5))
               * (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * t.dl / s.avgdl))
               * 1e6) AS BIGINT) AS c_micro
  FROM tf t JOIN qterms q USING (term) CROSS JOIN stats s
)
SELECT doc_id, score_micro, CAST(rank AS INTEGER) AS rank FROM (
  SELECT doc_id, CAST(sum(c_micro) AS BIGINT) AS score_micro,
         row_number() OVER (ORDER BY CAST(sum(c_micro) AS BIGINT) DESC, doc_id)
           AS rank
  FROM scored GROUP BY doc_id
) WHERE rank <= 20
""",
)
def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) lexical retrieval: top-20 documents for a
    deterministic query (the corpus's 8 highest-df terms) — the lexical
    half of a hybrid retrieval stack (`similarity_rank_fusion` supplies
    the fusion step, the ANN queries the dense half).

    Cross-engine exactness: each per-term partial score is quantized to
    integer micro-units BEFORE summation (the repo's micro-nat pattern —
    bigint sums are associative, so partial aggregation order can't
    change the result), and the plus-one idf variant keeps every term
    positive so HALF_UP rounding agrees across engines.

    Scale shape: postings (tf) join against a BROADCAST 8-row query-term
    list — only the query terms' posting lists survive the join, so the
    scoring stage touches |query_terms| posting lists, not the corpus
    vocabulary. Doc length rides along from the tokenize stage (max(dl)
    inside the existing groupBy — no second shuffle), corpus stats are a
    broadcast single row, and top-20 is orderBy+limit
    (TakeOrderedAndProject: per-partition heap, no global sort). The
    window rank is computed AFTER the limit, over 20 rows.

    At bench scale the tf/dfreq/stats branches each re-scan documents
    (Catalyst doesn't share subtrees); a production corpus materializes
    the postings table (doc_id, term, tf, dl) once and serves every
    query from it — the serving-side plan here (broadcast term list →
    postings equi-join → partial-agg top-k) is the per-query cost.
    """
    from stream_processing_project_spark.operators.text import words as _words

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(_words(F.col("text"))).alias("dl"),
        F.explode(_words(F.col("text"))).alias("term"),
    )
    # the postings table feeds BOTH the df/qterms branch and the scoring
    # branch; Catalyst shares no subtrees, so without materialization the
    # token explode + (doc_id, term) shuffle executes once PER consumer
    # (measured: zero ReusedExchange, 2 full passes at sf10).
    # localCheckpoint = the dedup_cross_doc_spans gram-table idiom.
    tf = toks.groupBy("doc_id", "term").agg(
        F.max("dl").alias("dl"), F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=False)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = dfreq.orderBy(F.col("df").desc(), "term").limit(8)
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(_words(F.col("text")))).alias("avgdl"),
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "c_micro",
            F.round(
                F.log(F.lit(1) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * 2.2)
                / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
                * 1e6
            ).cast("long"),
        )
    )
    top = (
        scored.groupBy("doc_id")
        .agg(F.sum("c_micro").alias("score_micro"))
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(20)
    )
    w = Window.orderBy(F.col("score_micro").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "score_micro", "rank"
    )


@register(
    "retrieval_prf_rocchio",
    oracle="""
WITH tok AS (
  SELECT doc_id, len(string_split(trim(text), ' ')) AS dl,
         unnest(string_split(trim(text), ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, max(dl) AS dl, count(*) AS tf
  FROM tok GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
qterms AS (SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT 8),
stats AS (
  SELECT count(*) AS n,
         avg(len(string_split(trim(text), ' '))) AS avgdl
  FROM documents
),
s1 AS (
  SELECT t.doc_id,
         CAST(round(ln(1 + (s.n - q.df + 0.5) / (q.df + 0.5))
               * (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * t.dl / s.avgdl))
               * 1e6) AS BIGINT) AS c_micro
  FROM tf t JOIN qterms q USING (term) CROSS JOIN stats s
),
fb AS (
  SELECT doc_id FROM (
    SELECT doc_id, CAST(sum(c_micro) AS BIGINT) AS sc
    FROM s1 GROUP BY doc_id ORDER BY sc DESC, doc_id LIMIT 10)
),
exp_cand AS (
  SELECT t.term, count(DISTINCT t.doc_id) AS ff
  FROM tf t JOIN fb USING (doc_id)
  WHERE t.term NOT IN (SELECT term FROM qterms)
  GROUP BY t.term
),
exp_terms AS (
  SELECT term, df FROM (
    SELECT e.term, d.df,
           CAST(round(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * e.ff * 1e6)
                AS BIGINT) AS w_micro
    FROM exp_cand e JOIN dfreq d USING (term) CROSS JOIN stats s
    ORDER BY w_micro DESC, e.term LIMIT 8)
),
allterms AS (
  SELECT term, df, 2 AS qw FROM qterms
  UNION ALL
  SELECT term, df, 1 AS qw FROM exp_terms
),
s2 AS (
  SELECT t.doc_id,
         q.qw * CAST(round(ln(1 + (s.n - q.df + 0.5) / (q.df + 0.5))
               * (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * t.dl / s.avgdl))
               * 1e6) AS BIGINT) AS c_micro
  FROM tf t JOIN allterms q USING (term) CROSS JOIN stats s
)
SELECT doc_id, score_micro, CAST(rank AS INTEGER) AS rank FROM (
  SELECT doc_id, CAST(sum(c_micro) AS BIGINT) AS score_micro,
         row_number() OVER (ORDER BY CAST(sum(c_micro) AS BIGINT) DESC, doc_id)
           AS rank
  FROM s2 GROUP BY doc_id
) WHERE rank <= 10
""",
)
def retrieval_prf_rocchio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio/RM3 shape) —
    the query-REWRITE stage that completes the retrieval stack
    (BM25 first pass → rerank → eval → now expansion): the 8-term BM25
    query retrieves its top-10 as the pseudo-relevant set; candidate
    expansion terms are ranked by an RSJ-style offer weight (idf ×
    feedback-doc frequency, micro-quantized like every BM25 partial),
    the 8 best NEW terms join the query, and the expanded 16-term query
    re-scores with Rocchio weights (original terms ×2, expansions ×1).
    Top-10 of the second pass is the result — tests pin that expansion
    genuinely reorders the first-pass ranking.

    Cross-engine exactness: both passes quantize per-term partials to
    integer micro-units before summation and the expansion ranking is
    an integer sort, so the whole two-pass pipeline value-hash-oracles.

    Scale shape: both scoring passes are postings equi-joins against
    BROADCAST term lists (8 then 16 rows); the feedback set is a 10-row
    broadcast semi-join; the expansion candidate scan touches only the
    feedback docs' postings. Per-query serving cost is 2× BM25 plus a
    10-doc vocabulary scan — the standard PRF economics."""
    from stream_processing_project_spark.operators.text import words as _words

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(_words(F.col("text"))).alias("dl"),
        F.explode(_words(F.col("text"))).alias("term"),
    )
    # the postings table feeds BOTH the df/qterms branch and the scoring
    # branch; Catalyst shares no subtrees, so without materialization the
    # token explode + (doc_id, term) shuffle executes once PER consumer
    # (measured: zero ReusedExchange, 2 full passes at sf10).
    # localCheckpoint = the dedup_cross_doc_spans gram-table idiom.
    tf = toks.groupBy("doc_id", "term").agg(
        F.max("dl").alias("dl"), F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=False)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = dfreq.orderBy(F.col("df").desc(), "term").limit(8)
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(_words(F.col("text")))).alias("avgdl"),
    )

    def c_micro():
        return F.round(
            F.log(
                F.lit(1) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * (F.col("tf") * 2.2)
            / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
            * 1e6
        ).cast("long")

    s1 = (
        tf.join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("c_micro", c_micro())
    )
    fb = (
        s1.groupBy("doc_id")
        .agg(F.sum("c_micro").alias("sc"))
        .orderBy(F.col("sc").desc(), "doc_id")
        .limit(10)
        .select("doc_id")
    )
    exp_cand = (
        tf.join(F.broadcast(fb), "doc_id", "left_semi")
        .join(F.broadcast(qterms.select("term")), "term", "left_anti")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("ff"))
    )
    exp_terms = (
        exp_cand.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "w_micro",
            F.round(
                F.log(
                    F.lit(1)
                    + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * F.col("ff")
                * 1e6
            ).cast("long"),
        )
        .orderBy(F.col("w_micro").desc(), "term")
        .limit(8)
        .select("term", "df")
    )
    allterms = qterms.select(
        "term", "df", F.lit(2).alias("qw")
    ).unionAll(exp_terms.select("term", "df", F.lit(1).alias("qw")))
    s2 = (
        tf.join(F.broadcast(allterms), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("c_micro", F.col("qw") * c_micro())
    )
    top = (
        s2.groupBy("doc_id")
        .agg(F.sum("c_micro").alias("score_micro"))
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(10)
    )
    w = Window.orderBy(F.col("score_micro").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "score_micro", "rank"
    )


@register(
    "retrieval_hybrid_rrf",
    oracle="""
WITH tok AS (
  SELECT doc_id, len(string_split(trim(text), ' ')) AS dl,
         unnest(string_split(trim(text), ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, max(dl) AS dl, count(*) AS tf
  FROM tok GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
stats AS (
  SELECT count(*) AS n,
         avg(len(string_split(trim(text), ' '))) AS avgdl
  FROM documents
),
qt AS (SELECT doc_id AS query_id, term FROM tf WHERE doc_id < 10),
lex10 AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT v.query_id, v.neighbor_id,
           row_number() OVER (PARTITION BY v.query_id
                              ORDER BY v.score_micro DESC, v.neighbor_id) AS rank
    FROM (
      SELECT q.query_id, t.doc_id AS neighbor_id,
             CAST(sum(CAST(round(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
                   * (t.tf * 2.2)
                   / (t.tf + 1.2 * (0.25 + 0.75 * t.dl / s.avgdl))
                   * 1e6) AS BIGINT)) AS BIGINT) AS score_micro
      FROM tf t
      JOIN qt q USING (term)
      JOIN dfreq d ON d.term = t.term
      CROSS JOIN stats s
      WHERE t.doc_id <> q.query_id
      GROUP BY 1, 2
    ) v
  ) WHERE rank <= 10
),
exact10 AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                   c.embedding::DOUBLE[]), 6)
                      DESC NULLS LAST, c.vec_id) AS rank
    FROM embeddings q, embeddings c
    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
  ) WHERE rank <= 10
)
SELECT query_id, neighbor_id, rrf, CAST(fused_rank AS INTEGER) AS fused_rank
FROM (
  SELECT COALESCE(a.query_id, b.query_id) AS query_id,
         COALESCE(a.neighbor_id, b.neighbor_id) AS neighbor_id,
         COALESCE(1.0 / (60 + a.rank), 0.0)
         + COALESCE(1.0 / (60 + b.rank), 0.0) AS rrf,
         row_number() OVER (
           PARTITION BY COALESCE(a.query_id, b.query_id)
           ORDER BY COALESCE(1.0 / (60 + a.rank), 0.0)
                    + COALESCE(1.0 / (60 + b.rank), 0.0) DESC,
                    COALESCE(a.neighbor_id, b.neighbor_id)) AS fused_rank
  FROM exact10 a
  FULL OUTER JOIN lex10 b
    ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
) WHERE fused_rank <= 5
""",
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid "more-like-this" retrieval: for 10 query documents, fuse a
    DENSE ranking (exact cosine top-10 over the parallel embeddings
    table — ids are shared across documents/embeddings) with a LEXICAL
    ranking (BM25 top-10 where the query is the query doc's own term
    set) via reciprocal-rank fusion — the standard two-tower + keyword
    serving stack, with only RANKS crossing the retriever boundary.

    Lexical leg at scale: postings (with df attached — the materialized
    postings-table design) join a BROADCAST query-term list, per-term
    contributions micro-quantized to bigints before the per-(query,
    candidate) sum (associative → partial-agg-safe), rank per query.
    The dense leg is the brute-force baseline at fixture scale; swap in
    an ANN query for production (rank_fusion only consumes ranks, so
    the fusion stage is unchanged). Fusion cost is k·|queries| rows,
    corpus-size-independent."""
    from stream_processing_project_spark.operators.text import words as _words

    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")

    toks = docs.select(
        "doc_id",
        F.size(_words(F.col("text"))).alias("dl"),
        F.explode(_words(F.col("text"))).alias("term"),
    )
    # the postings table feeds BOTH the df/qterms branch and the scoring
    # branch; Catalyst shares no subtrees, so without materialization the
    # token explode + (doc_id, term) shuffle executes once PER consumer
    # (measured: zero ReusedExchange, 2 full passes at sf10).
    # localCheckpoint = the dedup_cross_doc_spans gram-table idiom.
    tf = toks.groupBy("doc_id", "term").agg(
        F.max("dl").alias("dl"), F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=False)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    postings = tf.join(dfreq, "term")
    qt = tf.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("query_id"), "term"
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(_words(F.col("text")))).alias("avgdl"),
    )
    scored = (
        postings.join(F.broadcast(qt), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "c_micro",
            F.round(
                F.log(F.lit(1) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * 2.2)
                / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
                * 1e6
            ).cast("long"),
        )
        .groupBy("query_id", F.col("doc_id").alias("neighbor_id"))
        .agg(F.sum("c_micro").alias("score_micro"))
    )
    wl = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), "neighbor_id"
    )
    lex10 = (
        scored.withColumn("rank", F.row_number().over(wl))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "rank")
    )
    dense10 = similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=10)
    return similarity.rank_fusion([dense10, lex10], k=5)


@register(
    "retrieval_rerank_cross",
    oracle="""
WITH tok AS (
  SELECT doc_id, len(string_split(trim(text), ' ')) AS dl,
         unnest(string_split(trim(text), ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, max(dl) AS dl, count(*) AS tf
  FROM tok GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
qterms AS (SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT 8),
stats AS (
  SELECT count(*) AS n,
         avg(len(string_split(trim(text), ' '))) AS avgdl
  FROM documents
),
scored AS (
  SELECT t.doc_id, t.term, t.tf,
         CAST(round(ln(1 + (s.n - q.df + 0.5) / (q.df + 0.5))
               * (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * t.dl / s.avgdl))
               * 1e6) AS BIGINT) AS c_micro
  FROM tf t JOIN qterms q USING (term) CROSS JOIN stats s
),
cand AS (
  SELECT doc_id, CAST(sum(c_micro) AS BIGINT) AS score_micro
  FROM scored GROUP BY doc_id
  ORDER BY score_micro DESC, doc_id LIMIT 50
),
tokarr AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
feat AS (
  SELECT s.doc_id, c.score_micro,
         CAST(count(*) AS BIGINT) AS qcov,
         CAST(sum(s.tf) AS BIGINT) AS qtf_sum,
         CAST(min(list_position(a.toks, s.term)) AS BIGINT) AS first_pos
  FROM scored s JOIN cand c USING (doc_id) JOIN tokarr a USING (doc_id)
  GROUP BY 1, 2
)
SELECT doc_id, qcov, qtf_sum, first_pos, rerank_micro,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT doc_id, qcov, qtf_sum, first_pos,
         CAST(3000000 * qcov + 50000 * qtf_sum - 100 * first_pos
              + score_micro // 100 AS BIGINT) AS rerank_micro,
         row_number() OVER (
           ORDER BY 3000000 * qcov + 50000 * qtf_sum - 100 * first_pos
                    + score_micro // 100 DESC, doc_id) AS rank
  FROM feat
) WHERE rank <= 10
""",
)
def retrieval_rerank_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-encoder-style rerank stage — the second stage of the
    standard two-stage retrieval stack (retrieve cheap & wide, rerank
    expensive & narrow) that BM25/hybrid-RRF left unrepresented
    (VERDICT r08 task 6b): stage 1 is the BM25 retriever
    (retrieval_bm25_topk's deterministic 8-highest-df-term query)
    widened to top-50 CANDIDATES; stage 2 re-scores ONLY those
    candidates with query×document interaction features — the role a
    cross-encoder forward pass plays in production, here a
    deterministic integer feature mix so the rerank value-hash-oracles:
    qcov (distinct query terms matched), qtf_sum (total query-term
    occurrences), first_pos (earliest query-term position — the
    title/lead-paragraph signal), plus the stage-1 BM25 score as a
    prior. rerank = 3e6·qcov + 5e4·qtf_sum − 100·first_pos +
    bm25_micro/100, all exact bigint arithmetic; emit top-10.

    Scale shape: stage 1 is the audited BM25 plan (postings ⨝
    broadcast 8-term query, TakeOrderedAndProject top-50); stage 2
    joins the BROADCAST 50-row candidate list back to postings and to
    the token arrays, so the expensive per-(query, doc) feature pass
    touches 50 documents regardless of corpus size — exactly the
    economics that make cross-encoder reranking viable at 100 TB
    (a model scoring 50 pairs per query, never the corpus). Swapping
    the feature mix for a real model is a mapInPandas over the same
    ≤50-row frame."""
    from stream_processing_project_spark.operators.text import words as _words

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(_words(F.col("text"))).alias("dl"),
        F.explode(_words(F.col("text"))).alias("term"),
    )
    # the postings table feeds BOTH the df/qterms branch and the scoring
    # branch; Catalyst shares no subtrees, so without materialization the
    # token explode + (doc_id, term) shuffle executes once PER consumer
    # (measured: zero ReusedExchange, 2 full passes at sf10).
    # localCheckpoint = the dedup_cross_doc_spans gram-table idiom.
    tf = toks.groupBy("doc_id", "term").agg(
        F.max("dl").alias("dl"), F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=False)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = dfreq.orderBy(F.col("df").desc(), "term").limit(8)
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(_words(F.col("text")))).alias("avgdl"),
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "c_micro",
            F.round(
                F.log(
                    F.lit(1)
                    + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * 2.2)
                / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
                * 1e6
            ).cast("long"),
        )
    )
    cand = (
        scored.groupBy("doc_id")
        .agg(F.sum("c_micro").alias("score_micro"))
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(50)
    )
    tok_arr = docs.select("doc_id", _words(F.col("text")).alias("toks"))
    feat = (
        scored.select("doc_id", "term", "tf")
        .join(F.broadcast(cand), "doc_id")
        .join(tok_arr, "doc_id")
        .withColumn("pos", F.array_position(F.col("toks"), F.col("term")))
        .groupBy("doc_id", "score_micro")
        .agg(
            F.count(F.lit(1)).alias("qcov"),
            F.sum("tf").cast("long").alias("qtf_sum"),
            F.min("pos").cast("long").alias("first_pos"),
        )
    )
    rerank = (
        F.lit(3000000) * F.col("qcov")
        + F.lit(50000) * F.col("qtf_sum")
        - F.lit(100) * F.col("first_pos")
        + F.expr("score_micro DIV 100")
    ).cast("long")
    top = (
        feat.withColumn("rerank_micro", rerank)
        .orderBy(F.col("rerank_micro").desc(), "doc_id")
        .limit(10)
    )
    w = Window.orderBy(F.col("rerank_micro").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "doc_id", "qcov", "qtf_sum", "first_pos", "rerank_micro", "rank"
    )


# =========================== deduplication ===================================


@register(
    "dedup_exact_stats",
    oracle="""
SELECT lang,
       count(*) AS n_docs,
       count(DISTINCT md5(lower(trim(text)))) AS n_unique,
       count(*) - count(DISTINCT md5(lower(trim(text)))) AS n_dups
FROM documents
GROUP BY lang
""",
)
def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup accounting per lang (hash-groupBy on content md5)."""
    return dedup.exact_dedup_stats(t(spark, sf_dir, "documents"))


@register(
    "dedup_exact_keep_first",
    oracle="""
SELECT d.doc_id, d.lang
FROM documents d
JOIN (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents)
  GROUP BY fp
) k USING (doc_id)
""",
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, keep-lowest-doc_id policy (min-per-fingerprint, stays
    partial-aggregatable — no row_number shuffle)."""
    return dedup.exact_dedup_keep_first(t(spark, sf_dir, "documents")).select(
        "doc_id", "lang"
    )


@register(
    "dedup_ngram_jaccard",
    oracle="""
WITH words AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
  WHERE len(string_split(trim(text), ' ')) >= 2
),
sh0 AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(generate_series(1, len(ws) - 1),
                i -> concat(ws[i], ' ', ws[i + 1])))) AS sh
  FROM words
),
rare AS (
  SELECT * FROM sh0
  WHERE sh IN (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 100)
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM rare GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       sa.n_sh AS n_a, sb.n_sh AS n_b,
       n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.2
""",
    tags=("bench",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact bigram Jaccard with stop-shingle cap
    (df ≤ 100) — the scalable exact-verification stage of a dedup
    pipeline."""
    return dedup.ngram_jaccard_pairs(t(spark, sf_dir, "documents"))


@register(
    "dedup_cluster_resolve",
    oracle="""
WITH RECURSIVE words AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
  WHERE len(string_split(trim(text), ' ')) >= 2
),
sh0 AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(generate_series(1, len(ws) - 1),
                i -> concat(ws[i], ' ', ws[i + 1])))) AS sh
  FROM words
),
rare AS (
  SELECT * FROM sh0
  WHERE sh IN (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 100)
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM rare GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.1
),
edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach(node, lab) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node
)
SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
""",
)
def dedup_cluster_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (bigram Jaccard ≥ 0.1) resolved into duplicate
    clusters by connected components (min-label propagation): doc_id →
    min doc_id of its component — the keep-one-per-cluster decision
    step. The oracle recomputes reachability with a DuckDB recursive
    CTE, so the iterative Spark algorithm is value-checked end to end."""
    pairs = dedup.ngram_jaccard_pairs(t(spark, sf_dir, "documents"), threshold=0.1)
    return dedup.connected_components(pairs)


@register(
    "dedup_pipeline_keep",
    oracle="""
WITH RECURSIVE words AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
  WHERE len(string_split(trim(text), ' ')) >= 2
),
sh0 AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(generate_series(1, len(ws) - 1),
                i -> concat(ws[i], ' ', ws[i + 1])))) AS sh
  FROM words
),
rare AS (
  SELECT * FROM sh0
  WHERE sh IN (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 100)
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM rare GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.1
),
edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach(node, lab) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node
),
drops AS (
  SELECT node FROM (SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node)
  WHERE node <> cluster_id
)
SELECT d.doc_id, d.lang FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM drops)
""",
)
def dedup_pipeline_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dup dedup decision end to end: candidate pairs
    (bigram Jaccard ≥ 0.1) → connected components → drop every document
    that is not its cluster's representative (min doc_id); untouched
    documents pass through. Output is the kept corpus — what actually
    feeds tokenization in a training pipeline."""
    docs = t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.1)
    clusters = dedup.connected_components(pairs)
    drops = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return docs.join(drops, "doc_id", "left_anti").select("doc_id", "lang")


@register(
    "dedup_jaccard_prefix",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                               for i in range(1, len(w) - 1)])) AS sh
  FROM toks WHERE len(w) >= 3
),
dfreq AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
ranked AS (
  SELECT s.doc_id, s.sh,
         row_number() OVER (PARTITION BY s.doc_id ORDER BY d.df, s.sh) AS rk,
         count(*) OVER (PARTITION BY s.doc_id) AS L
  FROM sh s JOIN dfreq d USING (sh)
),
prefix AS (
  SELECT doc_id, sh FROM ranked WHERE rk <= L - ((7 * L + 9) // 10) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM prefix a JOIN prefix b USING (sh) WHERE a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_common
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id)
SELECT i.doc_a, i.doc_b, i.n_common, a.n_sh AS n_a, b.n_sh AS n_b
FROM inter i
JOIN sizes a ON a.doc_id = i.doc_a
JOIN sizes b ON b.doc_id = i.doc_b
WHERE 10 * i.n_common >= 7 * (a.n_sh + b.n_sh - i.n_common)
""",
)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard near-dup join (trigram shingles, t = 0.7) with
    LOSSLESS prefix filtering — the AllPairs/SSJoin scale rung between
    the lossy stop-shingle cap (ngram_jaccard_pairs) and probabilistic
    MinHash-LSH: candidates come only from each document's
    L − ⌈0.7·L⌉ + 1 RAREST shingles under a global (df, shingle) order,
    and pigeonhole guarantees the verified result equals brute force
    (pinned in tests). Every decision is exact integer arithmetic
    (operators/dedup.py::prefix_filter_jaccard_pairs)."""
    from stream_processing_project_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    return prefix_filter_jaccard_pairs(t(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_lsh",
    oracle="""
WITH words AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(ws)),
                i -> ws[i] || ' ' || ws[i + 1]))) AS s
  FROM words WHERE len(ws) >= 2
),
base AS (
  SELECT doc_id,
         ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS h
  FROM sh
),
hs AS (
  SELECT doc_id, p.p,
         min((((h + (p.p + 1) * 1122334455) % 2147483647)
              * ((2654435761 * (p.p + 1)) % 2147483647)
              + (40503 * (p.p + 7)) % 2147483647) % 2147483647) AS h
  FROM base, range(0, 32) p(p) GROUP BY 1, 2
),
sig AS (SELECT doc_id, list(h ORDER BY p) AS sig FROM hs GROUP BY 1),
bands AS (
  SELECT doc_id, b.b AS band_idx,
         md5(array_to_string(list_transform(
             list_slice(sig, b.b * 4 + 1, b.b * 4 + 4),
             x -> CAST(x AS VARCHAR)), ',')) AS bh
  FROM sig, range(0, 8) b(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id
),
est AS (
  SELECT c.doc_a, c.doc_b,
         sum(CASE WHEN sa.sig[p.p] = sb.sig[p.p] THEN 1 ELSE 0 END) / 32.0
           AS est_jaccard
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b, range(1, 33) p(p)
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= 0.5
""",
    tags=("bench",),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 perms) + LSH(8 bands × 4 rows) candidate pairs with
    estimated Jaccard ≥ 0.5. FULLY value-hash-oracled as of r08
    (VERDICT r07 task 6): signatures use the cross-engine md5-affine
    permutation family (operators/dedup.py::minhash_signatures) and
    band keys are md5 digests of the signature slice, so the DuckDB
    replay reproduces the sketch bit-for-bit — est_jaccard is an
    integer match-count divided by 32.0 (identical integer operands →
    identical IEEE double). Recall additionally driver-verified through
    the oracled dedup_minhash_containment companion, and semantics are
    pinned by tests with planted duplicates."""
    return dedup.minhash_lsh_pairs(t(spark, sf_dir, "documents"))


@register(
    "dedup_simhash",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM documents
),
th AS (
  SELECT doc_id,
         ('0x' || substr(md5(w), 1, 15))::BIGINT AS h1,
         ('0x' || substr(md5(w), 16, 1))::BIGINT AS h2
  FROM toks
),
votes AS (
  SELECT doc_id, j.j,
         sum(CASE WHEN ((CASE WHEN j.j < 60 THEN h1 >> j.j
                              ELSE h2 >> (j.j - 60) END) & 1) = 1
                  THEN 1 ELSE -1 END) AS v
  FROM th, range(0, 64) j(j) GROUP BY 1, 2
),
bits AS (
  SELECT doc_id, list(CASE WHEN v > 0 THEN 1 ELSE 0 END ORDER BY j) AS bits
  FROM votes GROUP BY 1
),
bands AS (
  SELECT doc_id, b.b AS band_idx,
         array_to_string(list_transform(
             list_slice(bits, b.b * 9 + 1,
                        CASE WHEN b.b = 6 THEN 64 ELSE b.b * 9 + 9 END),
             x -> CAST(x AS VARCHAR)), '') AS bh
  FROM bits, range(0, 7) b(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id
),
ham AS (
  SELECT c.doc_a, c.doc_b,
         CAST(sum(CASE WHEN ba.bits[p.p] <> bb.bits[p.p] THEN 1 ELSE 0 END)
              AS BIGINT) AS hamming
  FROM cand c
  JOIN bits ba ON ba.doc_id = c.doc_a
  JOIN bits bb ON bb.doc_id = c.doc_b, range(1, 65) p(p)
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 6
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs (Hamming ≤ 6) via pigeonhole band
    buckets (7 bands of ~9 bits). FULLY value-hash-oracled as of r08
    (VERDICT r07 task 6): bits derive from the cross-engine md5 token
    hash (operators/dedup.py::simhash_bits) and band keys are plain 0/1
    strings, so the DuckDB replay reproduces fingerprints, banding and
    the exact Hamming verify bit-for-bit. Recall additionally
    driver-verified through the oracled dedup_simhash_containment
    companion."""
    return dedup.simhash_pairs(t(spark, sf_dir, "documents"))


# Exact bigram-Jaccard near-dup pairs at the planted-duplicate threshold
# (j >= 0.9) — the shared oracle for the sketch CONTAINMENT companions
# below (VERDICT.md r01 item 4): each hash-seeded sketch semi-joins the
# exact pairs against its candidate set, so a single missed pair surfaces
# as a missing row against this exact SQL.
_EXACT_NEAR_DUP_09_SQL = """
WITH words AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
  WHERE len(string_split(trim(text), ' ')) >= 2
),
sh0 AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(generate_series(1, len(ws) - 1),
                i -> concat(ws[i], ' ', ws[i + 1])))) AS sh
  FROM words
),
rare AS (
  SELECT * FROM sh0
  WHERE sh IN (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 100)
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM rare GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.9
"""


@register("dedup_minhash_containment", oracle=_EXACT_NEAR_DUP_09_SQL)
def dedup_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment gate for the MinHash sketch: every exact near-dup pair
    (bigram Jaccard >= 0.9) must appear in the MinHash+LSH candidate set.
    The Spark side semi-joins the exact pairs against the sketch's
    candidates; the oracle is the exact-pairs SQL alone — so the result
    hash-matches IFF the sketch has full recall on the planted
    duplicates. Turns the rows-only dedup_minhash_lsh check into a hard
    driver-verified recall bound."""
    docs = t(spark, sf_dir, "documents")
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.9)
    cands = dedup.minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    return exact.join(cands, ["doc_a", "doc_b"], "left_semi").select(
        "doc_a", "doc_b", "jaccard"
    )


@register("dedup_simhash_containment", oracle=_EXACT_NEAR_DUP_09_SQL)
def dedup_simhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment gate for the SimHash sketch: every exact near-dup pair
    must fall within a Hamming-10 SimHash budget (near-identical docs
    keep most sketch bits; the widened verification budget covers the
    fixture tail — production dedup keeps the tighter default budget).
    Banding recall inside the budget is structural (bands = budget + 1,
    pigeonhole), so a mismatch here isolates sketch quality, not
    blocking luck."""
    docs = t(spark, sf_dir, "documents")
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.9)
    cands = dedup.simhash_pairs(docs, max_hamming=10).select("doc_a", "doc_b")
    return exact.join(cands, ["doc_a", "doc_b"], "left_semi").select(
        "doc_a", "doc_b", "jaccard"
    )


@register(
    "dedup_embedding_cosine",
    oracle="""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.35 — fixture embeddings
    are near-orthogonal random vectors, so the threshold sits in the tail
    that still yields pairs). Executes via banded-LSH blocking + exact
    in-block verify (equi-joins only — no all-pairs self-join in the
    plan); band geometry derives from the threshold and the result is
    EXACT on the fixtures (recall pinned vs the all-pairs baseline in
    tests/test_dedup_similarity.py at sf0.01 and sf0.1), so the exact
    all-pairs oracle still applies."""
    return similarity.embedding_near_dup_pairs(
        t(spark, sf_dir, "embeddings"), threshold=0.35
    )


# =========================== similarity search =================================


@register(
    "similarity_bruteforce_topk",
    oracle="""
SELECT query_id, neighbor_id, cos, CAST(rank AS INTEGER) AS rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cos,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6)
                    DESC NULLS LAST, c.vec_id) AS rank
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
) WHERE rank <= 5
""",
    tags=("bench",),
)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for 10 query vectors: broadcast
    queries × corpus scan, per-query window rank — the ANN baseline."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


def _lsh_oracle(bits: int, k: int, n_queries: int = 10, dim: int = 64) -> str:
    """DuckDB twin of the deterministic sign-code LSH plan — shared by
    the SQL-expression path (similarity_ann_lsh_oracled) and the GEMM
    execution path (similarity_ann_lsh): same quantization, same
    multiplicative-hash ±1 planes, same Hamming-1 multi-probe."""
    return f"""
WITH dz AS (
  SELECT vec_id, v, list_transform(range(1, {dim + 1}), d -> CAST(round(v[d] * 1048576.0) AS BIGINT)) AS qq
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
),
coded AS (
  SELECT vec_id, v,
    list_sum(list_transform(range(0, {bits}), p ->
      (CASE WHEN list_sum(list_transform(range(1, {dim + 1}), d ->
         (CASE WHEN ((p * 997 + d) * 2654435761) % 4294967296 >= 2147483648 THEN -1 ELSE 1 END) * qq[d]
      )) > 0 THEN 1 ELSE 0 END) * (1 << ({bits - 1} - p))
    )) AS bucket
  FROM dz
),
probes AS (
  SELECT vec_id AS query_id,
         unnest(list_prepend(bucket, list_transform(range(0, {bits}), j -> xor(bucket, 1 << j)))) AS bucket
  FROM coded WHERE vec_id < {n_queries}
),
cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
  FROM probes p JOIN coded c ON p.bucket = c.bucket AND c.vec_id <> p.query_id
),
scored AS (
  SELECT ca.query_id, ca.neighbor_id,
         round(list_cosine_similarity(q.v, c.v), 6) AS cos
  FROM cand ca JOIN dz q ON q.vec_id = ca.query_id JOIN dz c ON c.vec_id = ca.neighbor_id
)
SELECT query_id, neighbor_id, cos, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC NULLS LAST, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


@register("similarity_ann_lsh", oracle=_lsh_oracle(bits=8, k=5))
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 with the bucket codes built by the
    VECTORIZED GEMM path — one numpy matmul per Arrow batch, the way a
    production index build runs. r10 contract change (VERDICT r09 task
    1): the r01–r09 registration used RandomState Gaussian float planes,
    whose float trajectory no SQL engine reproduces (the adjudicated
    rows-only no-go). Moving the SAME GEMM execution to exact int64
    arithmetic (quantized vectors × multiplicative-hash ±1 planes —
    |dot| < 2^27, matmul exact) makes the codes bit-identical to the
    ANSI-SQL expression twin, so this name now carries a FULL value-hash
    oracle while keeping the Arrow-batched build coverage. The
    float-seeded variant stays recall-pinned in tests
    (operators/similarity.py::ann_lsh_topk)."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.ann_lsh_topk_gemm(
        emb, emb.filter(F.col("vec_id") < 10), k=5
    )


@register("similarity_ann_lsh_oracled", oracle=_lsh_oracle(bits=8, k=3))
def similarity_ann_lsh_oracled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_lsh's deterministic twin with a FULL value-hash oracle: the
    approximation itself is reproducible cross-engine (integer-quantized
    vectors, multiplicative-hash ±1 hyperplanes, Hamming-1 multi-probe),
    so the driver verifies the approximate top-3 exactly — closing the
    no_oracle gap for the bucket-prune ANN shape (the seeded variant
    stays as the scale path; recall floors pinned in tests)."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.ann_lsh_topk_oracled(emb, emb.filter(F.col("vec_id") < 10), k=3)


@register(
    "similarity_ann_ivf_oracled",
    oracle="""
WITH dz AS (
  SELECT vec_id, v, list_transform(range(1, 65), d -> CAST(round(v[d] * 1048576.0) AS BIGINT)) AS qq
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
),
coded AS (
  SELECT vec_id,
    list_sum(list_transform(range(0, 4), p ->
      (CASE WHEN list_sum(list_transform(range(1, 65), d ->
         (CASE WHEN ((p * 997 + d) * 2654435761) % 4294967296 >= 2147483648 THEN -1 ELSE 1 END) * qq[d]
      )) > 0 THEN 1 ELSE 0 END) * (1 << (3 - p))
    )) AS bucket,
    list_transform(range(0, 4), p ->
      abs(list_sum(list_transform(range(1, 65), d ->
         (CASE WHEN ((p * 997 + d) * 2654435761) % 4294967296 >= 2147483648 THEN -1 ELSE 1 END) * qq[d]
      )))) AS margins
  FROM dz
),
qflips AS (
  SELECT vec_id AS query_id, bucket AS b0,
         unnest(margins) AS margin, unnest(range(0, 4)) AS p
  FROM coded WHERE vec_id < 10
),
ranked AS (
  SELECT query_id, xor(b0, 1 << CAST(3 - p AS INTEGER)) AS bucket
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY margin ASC, p ASC) AS rn FROM qflips)
  WHERE rn <= 3
),
probes AS (
  SELECT query_id, bucket FROM ranked
  UNION ALL
  SELECT vec_id AS query_id, bucket FROM coded WHERE vec_id < 10
),
cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
  FROM probes p JOIN coded c ON p.bucket = c.bucket AND c.vec_id <> p.query_id
),
scored AS (
  SELECT ca.query_id, ca.neighbor_id,
         round(list_cosine_similarity(q.v, c.v), 6) AS cos
  FROM cand ca JOIN dz q ON q.vec_id = ca.query_id JOIN dz c ON c.vec_id = ca.neighbor_id
)
SELECT query_id, neighbor_id, cos, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC NULLS LAST, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 3
""",
)
def similarity_ann_ivf_oracled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ivf's deterministic twin with a FULL value-hash oracle: sign-
    pattern coarse quantizer (16 inverted lists) plus QUERY-ADAPTIVE
    margin-ranked multi-probe (flip the least-confident planes — the
    "next-nearest centroid" analogue), all in exact integer arithmetic
    so the probe ranking reproduces in SQL. Driver-verifies the IVF
    prune shape end to end."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk_oracled(emb, emb.filter(F.col("vec_id") < 10), k=3)


def _pq_oracle(m: int, bits: int, dim: int, k: int, shortlist: int | None) -> str:
    """DuckDB twin of operators/similarity.py::pq_topk — same integer
    arithmetic, parameterized over (m, bits) so oracle and engine stay
    in lockstep from one generator."""
    sub = dim // m
    code = (
        "list_sum(list_transform(range(0, {bits}), p ->\n"
        "      (CASE WHEN list_sum(list_transform(range(1, {sub1}), l ->\n"
        "         (CASE WHEN ((({JB} + p) * 997 + ({JS} + l)) * 2654435761) % 4294967296 >= 2147483648\n"
        "               THEN -1 ELSE 1 END) * qq[{JS} + l]\n"
        "      )) > 0 THEN 1 ELSE 0 END) * (1 << ({bits1} - p))\n"
        "    ))"
    )
    codes = ", ".join(
        code.format(bits=bits, sub1=sub + 1, bits1=bits - 1, JB=j * bits, JS=j * sub)
        for j in range(m)
    )
    adc_topk = f"""
SELECT query_id, neighbor_id, adc, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""
    rerank = f"""
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rank
    FROM scored
  ) WHERE rank <= {shortlist}
),
rescored AS (
  SELECT s.query_id, s.neighbor_id,
         round(list_cosine_similarity(q.v, c.v), 6) AS cos
  FROM short s JOIN dz q ON q.vec_id = s.query_id JOIN dz c ON c.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, cos, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC NULLS LAST, neighbor_id) AS rank
  FROM rescored
) WHERE rank <= {k}
"""
    return f"""
WITH dz AS (
  SELECT vec_id, v, list_transform(range(1, {dim + 1}), d -> CAST(round(v[d] * 1048576.0) AS BIGINT)) AS qq
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
),
codes AS (
  SELECT vec_id, qq, [{codes}] AS codes
  FROM dz
),
cexp AS (
  SELECT c.vec_id, jt.j, c.codes[jt.j + 1] AS code, lt.l, c.qq[jt.j * {sub} + lt.l + 1] AS x
  FROM codes c, range(0, {m}) AS jt(j), range(0, {sub}) AS lt(l)
),
cb AS (
  SELECT j, code, l, CAST(round(sum(x) * 1.0 / count(*)) AS BIGINT) AS cent
  FROM cexp GROUP BY j, code, l
),
lut AS (
  SELECT q.vec_id AS query_id, cb.j, cb.code, sum(q.qq[cb.j * {sub} + cb.l + 1] * cb.cent) AS val
  FROM (SELECT vec_id, qq FROM codes WHERE vec_id < 10) q, cb
  GROUP BY 1, 2, 3
),
ccode AS (
  SELECT c.vec_id AS neighbor_id, jt.j, c.codes[jt.j + 1] AS code
  FROM codes c, range(0, {m}) AS jt(j)
),
scored AS (
  SELECT l.query_id, c.neighbor_id, CAST(sum(l.val) AS BIGINT) AS adc
  FROM ccode c JOIN lut l ON c.j = l.j AND c.code = l.code AND c.neighbor_id <> l.query_id
  GROUP BY 1, 2
){"," if shortlist else ""}
{rerank if shortlist else adc_topk}
"""


@register("similarity_ann_pq", oracle=_pq_oracle(8, 4, 64, 5, None))
def similarity_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization top-5 with a FULL value-hash oracle: 8
    subspaces × 16 deterministic codewords, asymmetric-distance scoring
    via an exact-integer lookup table (operators/similarity.py::pq_topk).
    The PQ memory story the reference has no analogue for: corpus rows
    carry 4 B of codes instead of 256 B of floats at score time, and the
    whole ADC pass is an equi-join against a broadcast LUT — the
    billion-vector serving shape. Codebooks are corpus aggregations
    (never collected); every score is a sum of exact bigints, so the
    approximate ranking itself reproduces bit-for-bit in ANSI SQL."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.pq_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register("similarity_ann_pq_rerank", oracle=_pq_oracle(16, 5, 64, 5, 50))
def similarity_ann_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ serving pipeline: finer codebook (16 subspaces × 32 codewords),
    ADC top-50 shortlist, exact-cosine refine to top-5 — the standard
    two-stage billion-vector layout (codes-only corpus pass, full
    vectors touched for shortlist×|queries| rows only). Recall@5 ≥ 0.8
    vs brute force pinned in tests at sf0.01; every stage deterministic,
    so the full pipeline value-hash-oracles."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.pq_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, m=16, bits=5,
        rerank_shortlist=50,
    )


@register(
    "similarity_knn_classify",
    oracle="""
WITH topk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6)
                      DESC NULLS LAST, c.vec_id) AS rank
    FROM embeddings q, embeddings c
    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
  ) WHERE rank <= 5
),
votes AS (
  SELECT t.query_id, e.label AS nbr_label, count(*) AS votes
  FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
  GROUP BY 1, 2
),
pred AS (
  SELECT query_id, nbr_label, votes,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY votes DESC, nbr_label) AS rn
  FROM votes
)
SELECT p.query_id, q.label AS true_label, p.nbr_label AS pred_label, p.votes
FROM pred p JOIN embeddings q ON q.vec_id = p.query_id
WHERE p.rn = 1
""",
)
def similarity_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote label prediction (k=5, exact cosine neighbors,
    deterministic tie-break) for 10 query vectors — the classification
    use of the similarity stack."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.knn_classify(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "similarity_label_centroids",
    oracle="""
SELECT label, CAST(i - 1 AS INTEGER) AS pos,
       round(sum(v), 6) / count(*) AS centroid
FROM (SELECT label, generate_subscripts(embedding, 1) AS i,
             unnest(embedding::DOUBLE[]) AS v
      FROM embeddings)
GROUP BY 1, 2
""",
)
def similarity_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (the cluster-summary / classifier-
    prototype primitive) in long (label, dimension) format — partial-agg
    shuffle of |labels|×dim rows only."""
    return similarity.label_centroids(t(spark, sf_dir, "embeddings"))


def _kmeans_rounds_cte(
    k: int, iters: int, dim: int, train_cap: int | None = None
) -> str:
    """Shared WITH-body for the Lloyd's-training oracles: quantized
    vectors `q`, seed centroids `c0`, unrolled assign/update rounds,
    and a final assignment `a{iters+1}` against the trained centroids
    `c{iters}`. Each assignment is a lexicographic [dist, cid] list-min
    over the CROSS JOIN with the k-row centroid table; each update is
    per-dim integer floor division (offset-shifted values are
    non-negative so // == Spark's div). Seeds are the k smallest
    vec_ids. With `train_cap` the rounds (and seeds) run over the
    deterministic hash-rank sample `tr` (kmeans_fit's train_cap); the
    final assignment still covers the full corpus."""
    d1 = dim + 1
    assign = (
        "a{n} AS (\n"
        "  SELECT q.vec_id, any_value(q.qq) AS qq,\n"
        "         min([CAST(list_sum(list_transform(range(1, {d1}),\n"
        "                d -> (q.qq[d] - c.c[d]) * (q.qq[d] - c.c[d]))) AS BIGINT),\n"
        "              c.cid]) AS best\n"
        "  FROM {src} q CROSS JOIN c{p} c GROUP BY q.vec_id\n"
        ")"
    )
    update = (
        "s{n} AS (\n"
        "  SELECT best[2] AS cid, dt.d,\n"
        "         CAST(sum(qq[dt.d]) AS BIGINT) // count(*) AS cd\n"
        "  FROM a{n}, range(1, {d1}) AS dt(d) GROUP BY 1, 2\n"
        "),\n"
        "c{n} AS (\n"
        "  SELECT p.cid, COALESCE(nw.c, p.c) AS c\n"
        "  FROM c{p} p LEFT JOIN\n"
        "       (SELECT cid, list(cd ORDER BY d) AS c FROM s{n} GROUP BY cid) nw\n"
        "       USING (cid)\n"
        ")"
    )
    train_src = "tr" if train_cap is not None else "q"
    rounds = ",\n".join(
        assign.format(n=i, p=i - 1, d1=d1, src=train_src)
        + ",\n"
        + update.format(n=i, p=i - 1, d1=d1)
        for i in range(1, iters + 1)
    )
    tr_cte = (
        f""",
tr AS MATERIALIZED (
  SELECT vec_id, qq FROM q
  ORDER BY ((vec_id % 4294967296) * 31153
            + ((vec_id % 4294967296) * 40503 % 65536) * 65536) % 4294967296,
           vec_id LIMIT {train_cap}
)"""
        if train_cap is not None
        else ""
    )
    return f"""q AS (
  SELECT vec_id,
         list_transform(range(1, {d1}),
           d -> CAST(round(v[d] * 1048576.0) AS BIGINT) + 1048576) AS qq
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
){tr_cte},
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, qq AS c
  FROM (SELECT vec_id, qq FROM {train_src} ORDER BY vec_id LIMIT {k})
),
{rounds},
{assign.format(n=iters + 1, p=iters, d1=d1, src="q")}"""


def _kmeans_oracle(k: int, iters: int, dim: int) -> str:
    """Unrolled Lloyd's iterations (the PageRank-oracle pattern)."""
    return f"""
WITH {_kmeans_rounds_cte(k, iters, dim)}
SELECT best[2] AS cluster_id,
       count(*) AS n_members,
       CAST(sum(best[1]) AS BIGINT) AS inertia
FROM a{iters + 1} GROUP BY 1 ORDER BY 1
"""


def _ivf_trained_oracle(
    k: int, iters: int, dim: int, n_probe: int, topk: int, n_queries: int
) -> str:
    """Trained-IVF retrieval oracle: the shared Lloyd's rounds, then
    inverted lists from the final assignment, probe ranking against the
    trained centroid table, and exact bigint top-k within probed lists
    — same tie-breaks as the Spark plan ([dist, id] lexicographic)."""
    d1 = dim + 1
    dist = (
        "CAST(list_sum(list_transform(range(1, {d1}),"
        " d -> ({a}[d] - {b}[d]) * ({a}[d] - {b}[d]))) AS BIGINT)"
    )
    return f"""
WITH {_kmeans_rounds_cte(k, iters, dim)},
lists AS (SELECT vec_id, qq, best[2] AS cid FROM a{iters + 1}),
qs AS (SELECT vec_id AS query_id, qq FROM q WHERE vec_id < {n_queries}),
probes AS (
  SELECT query_id, cid FROM (
    SELECT s.query_id, c.cid,
           row_number() OVER (PARTITION BY s.query_id ORDER BY
             {dist.format(d1=d1, a="s.qq", b="c.c")}, c.cid) AS rn
    FROM qs s CROSS JOIN c{iters} c
  ) WHERE rn <= {n_probe}
),
cand AS (
  SELECT p.query_id, l.vec_id AS neighbor_id,
         {dist.format(d1=d1, a="s.qq", b="l.qq")} AS dist_sq
  FROM probes p
  JOIN lists l ON l.cid = p.cid
  JOIN qs s ON s.query_id = p.query_id
  WHERE l.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, dist_sq, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dist_sq, neighbor_id) AS rank
  FROM cand
) WHERE rank <= {topk}
"""


def _ivf_filtered_oracle(
    k: int, iters: int, dim: int, n_probe: int, topk: int, n_queries: int
) -> str:
    """_ivf_trained_oracle with a metadata PRE-filter: candidates must
    share the query's label, applied inside the probed lists before the
    top-k window (the filtered-ANN contract)."""
    d1 = dim + 1
    dist = (
        "CAST(list_sum(list_transform(range(1, {d1}),"
        " d -> ({a}[d] - {b}[d]) * ({a}[d] - {b}[d]))) AS BIGINT)"
    )
    return f"""
WITH {_kmeans_rounds_cte(k, iters, dim)},
labs AS (SELECT vec_id, label FROM embeddings),
lists AS (SELECT vec_id, qq, best[2] AS cid FROM a{iters + 1}),
qs AS (SELECT vec_id AS query_id, qq FROM q WHERE vec_id < {n_queries}),
probes AS (
  SELECT query_id, cid FROM (
    SELECT s.query_id, c.cid,
           row_number() OVER (PARTITION BY s.query_id ORDER BY
             {dist.format(d1=d1, a="s.qq", b="c.c")}, c.cid) AS rn
    FROM qs s CROSS JOIN c{iters} c
  ) WHERE rn <= {n_probe}
),
cand AS (
  SELECT p.query_id, l.vec_id AS neighbor_id,
         {dist.format(d1=d1, a="s.qq", b="l.qq")} AS dist_sq
  FROM probes p
  JOIN lists l ON l.cid = p.cid
  JOIN qs s ON s.query_id = p.query_id
  JOIN labs nl ON nl.vec_id = l.vec_id
  JOIN labs ql ON ql.vec_id = p.query_id
  WHERE l.vec_id <> p.query_id AND nl.label = ql.label
)
SELECT query_id, neighbor_id, dist_sq, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dist_sq, neighbor_id) AS rank
  FROM cand
) WHERE rank <= {topk}
"""


@register(
    "similarity_ann_ivf_filtered", oracle=_ivf_filtered_oracle(8, 3, 64, 4, 5, 10)
)
def similarity_ann_ivf_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA-FILTERED ANN (r10) — the FAISS-IDSelector / filtered-
    search capability every production vector store exposes (same-
    language retrieval, per-tenant search): trained-IVF top-5 where
    candidates must share the QUERY's label, with the predicate applied
    INSIDE the probed lists BEFORE the top-k (pre-filtering: exact
    recall within probes, unlike post-filtering a fixed top-k which can
    starve below k survivors — the documented trade). Probes widened to
    4 (vs the unfiltered twin's 2) because filtering thins each list —
    the standard filtered-search compensation. The label attach is two
    slim id→label equi-joins; at 100 TB the inverted lists are STORED
    with their filter columns so the predicate pushes to the scan.
    Deterministic end to end, so training + filtered retrieval
    value-hash-oracle as one pipeline."""
    return similarity.ivf_trained_topk(
        t(spark, sf_dir, "embeddings"),
        n_probe=4,
        label_col="label",
    )


@register("similarity_ann_ivf_trained", oracle=_ivf_trained_oracle(8, 3, 64, 2, 5, 10))
def similarity_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-5 over a TRAINED coarse quantizer — the full
    train→index→query composition: Lloyd's codebook (kmeans_fit) →
    inverted lists by nearest trained centroid → 2-probe exact-bigint
    scan of the probed lists only. Deterministic end to end, so the
    entire pipeline (training included) value-hash-oracles — the
    trained counterpart of the sign-hash `similarity_ann_ivf_oracled`
    twin (operators/similarity.py::ivf_trained_topk)."""
    return similarity.ivf_trained_topk(t(spark, sf_dir, "embeddings"))


@register("similarity_ann_ivf", oracle=_ivf_trained_oracle(16, 2, 64, 4, 3, 10))
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-3 (16 trained inverted lists, nprobe=4) with
    the ENTIRE index build — Lloyd assignments, list assignment, probe
    ranking — executed by the vectorized GEMM path: one int64 numpy
    matmul per Arrow batch. r10 contract change (VERDICT r09 task 1):
    the r01–r09 registration trained with MLlib float32 KMeans, whose
    float trajectory no SQL engine reproduces (the adjudicated
    rows-only no-go). Running the SAME GEMM execution over exact
    integers (offset-quantized vectors ≤ 2^21 → every matmul entry
    < 2^48, exact in int64) makes the Lloyd trajectory bit-identical to
    the expression-tree path, so this name now carries a FULL
    value-hash oracle while keeping the Arrow-batched production-build
    coverage. Distinct layout from similarity_ann_ivf_trained (16
    lists / 2 iters / 4 probes vs 8/3/2) so the two exercise different
    prune geometries. The MLlib float variant stays recall-pinned in
    tests (operators/similarity.py::ivf_topk)."""
    return similarity.ivf_trained_topk(
        t(spark, sf_dir, "embeddings"),
        k=16,
        iters=2,
        n_probe=4,
        topk=3,
        gemm=True,
    )


def _ivfpq_e2e_oracle(
    k: int, iters: int, dim: int, m: int, bits: int,
    n_probe: int, shortlist: int, topk: int, n_queries: int,
    train_cap: int | None = None,
) -> str:
    """IVF-PQ end-to-end oracle: the shared Lloyd's rounds
    (_kmeans_rounds_cte — OFFSET-quantized vectors `q`, trained
    centroids `c{iters}`, final assignment `a{iters+1}`), then PQ codes
    + exact-bigint codebook over the same offset vectors, L2-ADC lookup
    tables, probe ranking, code-only candidate scoring restricted to
    probed lists, and exact rerank of the ADC shortlist — the same
    integer arithmetic and [value, id] tie-breaks as
    operators/similarity.py::ivfpq_topk."""
    sub = dim // m
    d1 = dim + 1
    code = (
        "list_sum(list_transform(range(0, {bits}), p ->\n"
        "      (CASE WHEN list_sum(list_transform(range(1, {sub1}), l ->\n"
        "         (CASE WHEN ((({JB} + p) * 997 + ({JS} + l)) * 2654435761) % 4294967296 >= 2147483648\n"
        "               THEN -1 ELSE 1 END) * qq[{JS} + l]\n"
        "      )) > 0 THEN 1 ELSE 0 END) * (1 << ({bits1} - p))\n"
        "    ))"
    )
    codes = ", ".join(
        code.format(bits=bits, sub1=sub + 1, bits1=bits - 1, JB=j * bits, JS=j * sub)
        for j in range(m)
    )
    dist = (
        "CAST(list_sum(list_transform(range(1, {d1}),"
        " d -> ({a}[d] - {b}[d]) * ({a}[d] - {b}[d]))) AS BIGINT)"
    )
    return f"""
WITH {_kmeans_rounds_cte(k, iters, dim, train_cap)},
lists AS (SELECT vec_id, qq, best[2] AS cid FROM a{iters + 1}),
codes AS (SELECT vec_id, cid, qq, [{codes}] AS pq FROM lists),
cexp AS (
  SELECT jt.j, c.pq[jt.j + 1] AS code, lt.l, c.qq[jt.j * {sub} + lt.l + 1] AS x
  FROM codes c, range(0, {m}) AS jt(j), range(0, {sub}) AS lt(l)
),
cb AS (
  SELECT j, code, l, CAST(round(sum(x) * 1.0 / count(*)) AS BIGINT) AS cent
  FROM cexp GROUP BY j, code, l
),
qs AS (SELECT vec_id AS query_id, qq FROM q WHERE vec_id < {n_queries}),
lut AS (
  SELECT s.query_id, cb.j, cb.code,
         sum((s.qq[cb.j * {sub} + cb.l + 1] - cb.cent)
             * (s.qq[cb.j * {sub} + cb.l + 1] - cb.cent)) AS val
  FROM qs s, cb GROUP BY 1, 2, 3
),
probes AS (
  SELECT query_id, cid FROM (
    SELECT s.query_id, c.cid,
           row_number() OVER (PARTITION BY s.query_id ORDER BY
             {dist.format(d1=d1, a="s.qq", b="c.c")}, c.cid) AS rn
    FROM qs s CROSS JOIN c{iters} c
  ) WHERE rn <= {n_probe}
),
cand AS (
  SELECT p.query_id, co.vec_id AS neighbor_id, co.pq
  FROM probes p JOIN codes co ON co.cid = p.cid
  WHERE co.vec_id <> p.query_id
),
adc AS (
  SELECT ca.query_id, ca.neighbor_id, CAST(sum(l.val) AS BIGINT) AS adc_dist
  FROM (SELECT query_id, neighbor_id, jt.j, pq[jt.j + 1] AS code
        FROM cand, range(0, {m}) AS jt(j)) ca
  JOIN lut l ON l.query_id = ca.query_id AND l.j = ca.j AND l.code = ca.code
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc_dist, neighbor_id) AS rn
    FROM adc
  ) WHERE rn <= {shortlist}
),
rescored AS (
  SELECT s.query_id, s.neighbor_id,
         {dist.format(d1=d1, a="sq.qq", b="co.qq")} AS dist_sq
  FROM short s
  JOIN qs sq ON sq.query_id = s.query_id
  JOIN lists co ON co.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, dist_sq, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dist_sq, neighbor_id) AS rank
  FROM rescored
) WHERE rank <= {topk}
"""


# Lloyd's codebook trains on a 2000-row deterministic hash-rank sample
# (VERDICT r07 task 5): at sf0.01/sf0.1 (≤2000 vectors) the sample IS
# the corpus — fixture results and recall pins bit-identical to full
# training; at sf1/sf10 the flagged 3.2×-decade training stage becomes
# O(cap) while index/query passes stay the only corpus-sized work.
_IVFPQ_TRAIN_CAP = 2000


@register(
    "similarity_ann_ivfpq_e2e",
    oracle=_ivfpq_e2e_oracle(8, 3, 64, 16, 5, 2, 50, 5, 10, _IVFPQ_TRAIN_CAP),
)
def similarity_ann_ivfpq_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed END-TO-END in one oracled pipeline — train the
    Lloyd's coarse quantizer, pack PQ codes + exact-bigint codebook,
    probe the 2 nearest trained lists, L2-ADC-score candidates from
    CODES against a broadcast LUT, exact-rerank the top-50 shortlist to
    top-5 (operators/similarity.py::ivfpq_topk). The production
    billion-vector serving path as a single deterministic dataflow:
    training, indexing and querying all reproduce bit-for-bit in SQL,
    so the whole composition value-hash-oracles — the capstone over
    similarity_kmeans_train / similarity_ann_pq_rerank /
    similarity_ann_ivf_trained."""
    return similarity.ivfpq_topk(
        t(spark, sf_dir, "embeddings"), train_cap=_IVFPQ_TRAIN_CAP
    )


@register("similarity_kmeans_train", oracle=_kmeans_oracle(8, 3, 64))
def similarity_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codebook / coarse-quantizer training: 3 Lloyd iterations of
    k-means (k=8) over integer-quantized embeddings, fully value-hash-
    oracled (the iterative-ML family next to PageRank/LPA — see
    operators/similarity.py::kmeans_train for the determinism contract
    and the MLlib-style one-aggregation-per-round scale shape). Output
    is the final assignment census per cluster."""
    return similarity.kmeans_train(t(spark, sf_dir, "embeddings"))


# =========================== multimodal ========================================


@register(
    "multimodal_decode",
    oracle="""
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CAST(16 + (octet_length(encode(text)) % 64) * 8 AS INTEGER) AS width,
       CAST(16 + (octet_length(encode(text)) % 48) * 8 AS INTEGER) AS height,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                 ELSE 1 + octet_length(encode(text)) % 24 END AS INTEGER) AS n_frames,
       CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS INTEGER) AS sample_rate
FROM documents
""",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload decode via Arrow-batched mapInPandas (codec stubbed
    deterministically — see operators/multimodal.py; the batch plumbing,
    schema, and binary handling are real, which is what the oracle
    verifies)."""
    media = multimodal.attach_binary_payload(t(spark, sf_dir, "documents"))
    return multimodal.decode_media(media)


@register(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id,
       CAST(1 + octet_length(encode(text)) % 24 AS INTEGER) AS n_frames,
       CAST((1 + octet_length(encode(text)) % 24 + 4) // 5 AS INTEGER) AS n_sampled
FROM documents
WHERE doc_id % 3 = 2
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan for video rows (every 5th frame) — sequence +
    filter column expressions over the decoded metadata."""
    media = multimodal.attach_binary_payload(t(spark, sf_dir, "documents"))
    return multimodal.frame_sample(multimodal.decode_media(media)).select(
        "doc_id", "n_frames", "n_sampled"
    )


# =========================== vectorized UDF surface =============================


@register(
    "udf_pandas_scalar",
    oracle="""
SELECT event_id, length(props) AS props_len FROM events WHERE event_id % 50 = 0
""",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow-vectorized) — §2.7 capability. The work
    (string length) is trivially oracle-checkable; the point is the
    Arrow batch path."""

    @F.pandas_udf(T.LongType())
    def props_len(s: pd.Series) -> pd.Series:
        return s.str.len().astype("int64")

    return (
        t(spark, sf_dir, "events")
        .filter(F.pmod(F.col("event_id"), F.lit(50)) == 0)
        .select("event_id", props_len(F.col("props")).alias("props_len"))
    )


@register(
    "udf_grouped_rank",
    oracle="""
SELECT event_id, event_type, value,
       row_number() OVER (PARTITION BY event_type
                          ORDER BY value DESC NULLS LAST, event_id) AS rank
FROM events WHERE event_id % 20 = 0
""",
)
def udf_grouped_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (per-group pandas DataFrame) — §2.7
    capability; deterministic rank so the window-function oracle matches."""

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["value", "event_id"], ascending=[False, True])
        pdf["rank"] = range(1, len(pdf) + 1)
        return pdf

    return (
        t(spark, sf_dir, "events")
        .filter(F.pmod(F.col("event_id"), F.lit(20)) == 0)
        .select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(
            rank_group, "event_id bigint, event_type string, value double, rank bigint"
        )
    )


@register(
    "text_winnow_candidates",
    oracle="""
WITH g AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(text) - 7, 0) + 1),
           i -> ('0x' || substr(md5(substr(text, i, 8)), 1, 15))::BIGINT)
           AS grams
  FROM documents WHERE length(text) >= 8
),
fp0 AS (
  SELECT doc_id,
         list_distinct(list_transform(range(0, len(grams) - 3),
           j -> list_min(list_slice(grams, j + 1, j + 4)))) AS fps
  FROM g WHERE len(grams) >= 4
),
fps AS (SELECT doc_id, unnest(fps) AS fp FROM fp0),
rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 10),
rf AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare r USING (fp)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM rf a JOIN rf b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared FROM pairs WHERE n_shared >= 3
""",
)
def text_winnow_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint near-dup candidates: docs sharing >= 3 RARE
    fingerprints (shared substrings >= k+window-1 chars), found by an
    equi-join on exploded fingerprints — the plagiarism-detection
    pattern. Fingerprints appearing in > 10 docs are dropped first
    (common-phrase cap, same lever as the stop-shingle cap in dedup.py:
    a fingerprint in df docs generates O(df²) pairs). FULLY
    value-hash-oracled as of r08 (VERDICT r07 task 6): the gram hash is
    the cross-engine 60-bit md5 (operators/text.py::fingerprint_docs),
    so the DuckDB replay reproduces grams, window minima, the rarity
    cap and the pair counts exactly; the winnowing guarantee stays
    pinned in tests and driver-verified through the oracled
    text_winnow_containment companion."""
    from stream_processing_project_spark.operators.text import fingerprint_docs

    fps = fingerprint_docs(t(spark, sf_dir, "documents")).select(
        "doc_id", F.explode("fingerprints").alias("fp")
    )
    rare = fps.join(
        fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") <= 10),
        "fp",
        "left_semi",
    )
    a = rare.select(F.col("doc_id").alias("doc_a"), "fp")
    b = rare.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
    )


@register(
    "dedup_semantic_keep",
    oracle="""
WITH RECURSIVE dz AS (
  SELECT vec_id, v, list_transform(range(1, 65), d -> CAST(round(v[d] * 1048576.0) AS BIGINT)) AS qq
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
),
coded AS (
  SELECT vec_id, v,
    list_sum(list_transform(range(0, 4), p ->
      (CASE WHEN list_sum(list_transform(range(1, 65), d ->
         (CASE WHEN ((p * 997 + d) * 2654435761) % 4294967296 >= 2147483648 THEN -1 ELSE 1 END) * qq[d]
      )) > 0 THEN 1 ELSE 0 END) * (1 << (3 - p))
    )) AS cluster
  FROM dz
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM coded a JOIN coded b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.35
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b AS u, id_a AS v FROM pairs
),
reach(u, label) AS (
  SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, r.label FROM edges e JOIN reach r ON r.u = e.v WHERE r.label < e.u
),
clusters AS (SELECT u AS vec_id, min(label) AS cluster_id FROM reach GROUP BY u),
drop_set AS (SELECT vec_id FROM clusters WHERE vec_id <> cluster_id)
SELECT e.vec_id, e.label
FROM embeddings e
WHERE e.vec_id NOT IN (SELECT vec_id FROM drop_set)
""",
)
def dedup_semantic_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup pipeline (Abbas et al. 2023), end
    to end with a FULL oracle: cluster embeddings with the deterministic
    sign-pattern coarse quantizer (16 clusters — the SQL-reproducible
    stand-in for the paper's k-means), find exact-cosine near-dup pairs
    WITHIN clusters only (equi-join on cluster id — the whole point of
    SemDeDup's cluster restriction at scale), resolve duplicate groups
    via connected components, keep the minimum id per group. Oracle:
    same quantizer + recursive-CTE transitive closure in DuckDB.

    100 TB shape: cluster assignment is a narrow map (one GEMM-style
    code per vector); the pair join shuffles on cluster id (clusters are
    the salt — no all-pairs); CC runs on the pair list, which is orders
    of magnitude smaller than the corpus; the keep-set applies as one
    anti-join."""
    emb = t(spark, sf_dir, "embeddings")
    coded = emb.selectExpr(
        "vec_id",
        "cast(embedding AS array<double>) AS v",
        f"{similarity._quantize_expr('embedding', 64)} AS qq",
    ).localCheckpoint().selectExpr(
        "vec_id", "v", f"{similarity._code_expr('qq', 4, 64)} AS cluster"
    )
    a = coded.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), "cluster"
    )
    b = coded.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), "cluster"
    )
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(similarity.cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= 0.35)
        .select("id_a", "id_b")
    )
    # star method: at sf0.1 the 0.35-threshold in-cluster pair graph has
    # component diameter > 20, which exceeds plain propagation's round
    # budget (observed non-convergence error); large-star/small-star
    # converges in O(log² n) rounds regardless of diameter.
    clusters = dedup.connected_components(
        pairs, src="id_a", dst="id_b", method="star"
    )
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias("vec_id")
    )
    return emb.join(drop, "vec_id", "left_anti").select("vec_id", "label")


@register("text_winnow_containment", oracle=_EXACT_NEAR_DUP_09_SQL)
def text_winnow_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment gate for winnowing fingerprints: every exact near-dup
    pair (bigram Jaccard >= 0.9) must share at least one rare winnowed
    fingerprint (the winnowing guarantee: any common substring of
    >= k+window-1 chars yields a shared fingerprint, and 0.9-Jaccard
    docs share long runs). Single-fingerprint evidence (vs the
    candidate query's >= 3) because this is the recall gate, not the
    precision filter. Hash-seeded sketch → exact-pairs oracle via
    semi-join, same pattern as the dedup_*_containment gates."""
    from stream_processing_project_spark.operators.text import fingerprint_docs

    docs = t(spark, sf_dir, "documents")
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.9)
    fps = fingerprint_docs(docs).select("doc_id", F.explode("fingerprints").alias("fp"))
    rare = fps.join(
        fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") <= 10),
        "fp",
        "left_semi",
    )
    a = rare.select(F.col("doc_id").alias("doc_a"), "fp")
    b = rare.select(F.col("doc_id").alias("doc_b"), "fp")
    cands = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return exact.join(cands, ["doc_a", "doc_b"], "left_semi").select(
        "doc_a", "doc_b", "jaccard"
    )


@register(
    "dedup_incremental",
    oracle="""
WITH corpus AS (
  SELECT DISTINCT md5(lower(trim(text))) AS fp FROM documents WHERE doc_id < 250
),
new_docs AS (SELECT * FROM documents WHERE doc_id >= 250),
fresh AS (
  SELECT d.*, md5(lower(trim(d.text))) AS fp FROM new_docs d
  WHERE md5(lower(trim(d.text))) NOT IN (SELECT fp FROM corpus)
),
keep AS (SELECT fp, min(doc_id) AS doc_id FROM fresh GROUP BY fp)
SELECT f.doc_id, f.lang FROM fresh f JOIN keep k ON f.fp = k.fp AND f.doc_id = k.doc_id
""",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: the docs table split into an existing corpus
    (doc_id < 250) and a new batch; new documents already present in the
    corpus are dropped (anti-join on fingerprint), then the batch dedups
    against itself keep-first — the per-increment shape of a production
    training-data pipeline."""
    docs = t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 250)
    new_docs = docs.filter(F.col("doc_id") >= 250)
    return dedup.incremental_dedup(new_docs, corpus).select("doc_id", "lang")


@register(
    "dedup_incremental_minhash",
    oracle="""
WITH words AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
  WHERE len(string_split(trim(text), ' ')) >= 2
),
sh0 AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(generate_series(1, len(ws) - 1),
                i -> concat(ws[i], ' ', ws[i + 1])))) AS sh
  FROM words
),
rare AS (
  SELECT * FROM sh0
  WHERE sh IN (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 100)
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM rare GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM rare a
  JOIN rare b ON a.sh = b.sh AND a.doc_id < 250 AND b.doc_id >= 250
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.9
""",
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup (the sketch companion to `dedup_incremental`'s
    exact fingerprints): the docs table split into an existing corpus
    (doc_id < 250) and a new batch; batch docs near-identical to a corpus
    doc are found by a cross-table MinHash band join — the corpus is
    never self-paired, and in production its signature/band table is
    precomputed, so each increment costs O(|batch|).

    Containment gate (the oracled-sketch pattern): the output is the
    EXACT batch-vs-corpus near-dup pairs (bigram Jaccard ≥ 0.9, fully
    SQL-expressible) semi-joined against the LSH candidates, and the
    oracle is the exact SQL alone — any true pair the band join misses
    drops a row and fails the value hash, so the driver verifies the
    incremental sketch path's recall, not just its row count."""
    docs = t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 250)
    batch = docs.filter(F.col("doc_id") >= 250)
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.9).filter(
        (F.col("doc_a") < 250) & (F.col("doc_b") >= 250)
    )
    cands = dedup.minhash_lsh_cross_pairs(batch, corpus).select(
        F.col("corpus_id").alias("doc_a"), F.col("new_id").alias("doc_b")
    )
    return exact.join(cands, ["doc_a", "doc_b"], "left_semi").select(
        "doc_a", "doc_b", "jaccard"
    )


@register(
    "multimodal_resize_plan",
    oracle="""
WITH meta AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         length(text) AS n_bytes
  FROM documents
),
decoded AS (
  SELECT doc_id, kind,
         16 + (n_bytes % 64) * 8 AS width,
         16 + (n_bytes % 48) * 8 AS height
  FROM meta
)
SELECT doc_id, kind, width, height,
       CAST(floor(width * least(224.0 / width, 224.0 / height)) AS INTEGER) AS out_w,
       CAST(floor(height * least(224.0 / width, 224.0 / height)) AS INTEGER) AS out_h,
       224 - CAST(floor(width * least(224.0 / width, 224.0 / height)) AS INTEGER) AS pad_w,
       224 - CAST(floor(height * least(224.0 / width, 224.0 / height)) AS INTEGER) AS pad_h
FROM decoded WHERE kind IN ('image', 'video')
""",
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning over the decoded multimodal table: aspect-
    preserving 224×224 letterbox dims/padding as pure column math
    (payload bytes untouched — a catalog-wide resize plan is metadata
    work). Runs the full chain: binary attach → mapInPandas decode stub
    → resize plan; the oracle replays the deterministic stub."""
    media = multimodal.attach_binary_payload(t(spark, sf_dir, "documents"))
    decoded = multimodal.decode_media(media)
    return multimodal.resize_plan(decoded)


@register(
    "sampling_train_val_test",
    oracle="""
SELECT doc_id, lang,
       CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 10 THEN 'test'
            WHEN (doc_id * 2654435761) % 4294967296 % 100 < 20 THEN 'val'
            ELSE 'train' END AS split
FROM documents
""",
)
def sampling_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) as a pure function
    of doc identity — a Knuth multiplicative hash reproduces
    byte-identically in any engine (the oracle recomputes it in DuckDB),
    unlike rand()/sample() whose seeds are per-partition."""
    from stream_processing_project_spark.operators.sampling import train_val_test

    return train_val_test(t(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "split"
    )


@register(
    "sampling_token_budget",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, len(string_split(trim(text), ' ')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT *, sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM toks
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
FROM cum WHERE c <= 5000
""",
)
def sampling_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection: greedy prefix of documents (by id) whose
    running token total stays within a 5k-token budget — the "fill a
    training mix" primitive; the oracle runs the same running-total
    window."""
    from stream_processing_project_spark.operators.sampling import token_budget_select
    from stream_processing_project_spark.operators.text import token_count

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return token_budget_select(docs, "n_tokens", budget=5000)


@register(
    "sampling_pack_sequences",
    oracle="""
WITH RECURSIVE toks AS (
  SELECT doc_id, lang,
         CAST(len(string_split(trim(text), ' ')) AS INTEGER) AS n_tokens,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS INTEGER) AS rn
  FROM documents
),
packed AS (
  SELECT doc_id, lang, n_tokens, rn, n_tokens AS acc, 0 AS pack_id
  FROM toks WHERE rn = 1
  UNION ALL
  SELECT t.doc_id, t.lang, t.n_tokens, t.rn,
         CASE WHEN p.acc + t.n_tokens > 256 THEN t.n_tokens
              ELSE p.acc + t.n_tokens END,
         CASE WHEN p.acc + t.n_tokens > 256 THEN p.pack_id + 1
              ELSE p.pack_id END
  FROM toks t JOIN packed p ON t.lang = p.lang AND t.rn = p.rn + 1
)
SELECT doc_id, lang, n_tokens, CAST(pack_id AS INTEGER) AS pack_id FROM packed
""",
)
def sampling_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing into 256-token training bins, per
    language — the pre-tokenization batching step that turns filtered
    documents into fixed-capacity sequences. The recurrence runs in
    Arrow-batched pandas per key; the oracle replays it as a DuckDB
    recursive CTE over the same id order."""
    from stream_processing_project_spark.operators.sampling import pack_sequences
    from stream_processing_project_spark.operators.text import token_count

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count(F.col("text")).alias("n_tokens")
    )
    return pack_sequences(docs, "n_tokens", capacity=256, key_col="lang")


@register(
    "sampling_stratified",
    oracle="""
SELECT doc_id, lang
FROM documents
WHERE (doc_id * 2654435761) % 4294967296 % 100 <
      CASE WHEN lang = 'en' THEN 25 ELSE 75 END
""",
)
def sampling_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: downsample English (the
    dominant stratum) to 25% and keep 75% of every other language —
    the class-rebalancing primitive, reproducible in any engine (the
    oracle recomputes the identity-hash selection)."""
    from stream_processing_project_spark.operators.sampling import stratified_sample

    return stratified_sample(
        t(spark, sf_dir, "documents"),
        "lang",
        rates={"en": 25},
        default_pct=75,
    ).select("doc_id", "lang")


@register(
    "multimodal_embed_topk",
    oracle="""
WITH emb AS (
  SELECT doc_id,
         list_transform(generate_series(1, 16),
                        i -> ord(substr(text, i, 1)) / 256.0) AS e
  FROM documents WHERE octet_length(encode(text)) >= 16
)
SELECT query_id, neighbor_id, cos, CAST(rank AS INTEGER) AS rank FROM (
  SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
         round(list_cosine_similarity(q.e, c.e), 6) AS cos,
         row_number() OVER (
           PARTITION BY q.doc_id
           ORDER BY round(list_cosine_similarity(q.e, c.e), 6)
                    DESC NULLS LAST, c.doc_id) AS rank
  FROM emb q, emb c
  WHERE q.doc_id < 5 AND c.doc_id <> q.doc_id
) WHERE rank <= 3
""",
)
def multimodal_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal retrieval composition: catalog → binary
    payload → feature embedding (deterministic encoder stub) → exact
    cosine top-3 — media similarity search end to end on the engine's
    own operators. The oracle recomputes the byte-wise embedding and
    ranking in SQL."""
    media = multimodal.attach_binary_payload(t(spark, sf_dir, "documents"))
    emb = multimodal.feature_embedding(media)
    return similarity.brute_force_topk(
        emb, emb.filter(F.col("doc_id") < 5), k=3, id_col="doc_id"
    )


_Q8 = (
    "list_transform(embedding, x -> least(greatest("
    "CAST(round(CAST(x AS DOUBLE) * 64, 0) AS INTEGER), -127), 127))"
)


@register(
    "similarity_quantized_topk",
    oracle=f"""
WITH z AS (SELECT vec_id, {_Q8} AS q8 FROM embeddings)
SELECT query_id, neighbor_id, dot, CAST(rank AS INTEGER) AS rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(list_dot_product(q.q8::DOUBLE[], c.q8::DOUBLE[]) AS BIGINT) AS dot,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_dot_product(q.q8::DOUBLE[], c.q8::DOUBLE[]) DESC,
                    c.vec_id) AS rank
  FROM z q, z c
  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
) WHERE rank <= 5
""",
    tags=("bench",),
)
def similarity_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized top-5 retrieval for 10 query vectors: symmetric
    ×64 quantization (exact — power-of-two scale) then INTEGER dot
    products, so scores and ranking are bit-reproducible cross-engine
    (the oracle's double-cast dot product is exact below 2^53). The
    production memory/bandwidth path for billion-vector serving —
    4× smaller vectors, SIMD integer arithmetic
    (operators/similarity.py::quantized_topk)."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.quantized_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "similarity_rank_fusion",
    oracle=f"""
WITH exact10 AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                   c.embedding::DOUBLE[]), 6)
                      DESC NULLS LAST, c.vec_id) AS rank
    FROM embeddings q, embeddings c
    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
  ) WHERE rank <= 10
),
z AS (SELECT vec_id, {_Q8} AS q8 FROM embeddings),
quant10 AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_dot_product(q.q8::DOUBLE[], c.q8::DOUBLE[]) DESC,
                      c.vec_id) AS rank
    FROM z q, z c
    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
  ) WHERE rank <= 10
)
SELECT query_id, neighbor_id, rrf, CAST(fused_rank AS INTEGER) AS fused_rank
FROM (
  SELECT COALESCE(a.query_id, b.query_id) AS query_id,
         COALESCE(a.neighbor_id, b.neighbor_id) AS neighbor_id,
         COALESCE(1.0 / (60 + a.rank), 0.0)
         + COALESCE(1.0 / (60 + b.rank), 0.0) AS rrf,
         row_number() OVER (
           PARTITION BY COALESCE(a.query_id, b.query_id)
           ORDER BY COALESCE(1.0 / (60 + a.rank), 0.0)
                    + COALESCE(1.0 / (60 + b.rank), 0.0) DESC,
                    COALESCE(a.neighbor_id, b.neighbor_id)) AS fused_rank
  FROM exact10 a
  FULL OUTER JOIN quant10 b
    ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
) WHERE fused_rank <= 5
""",
)
def similarity_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrievers — exact-cosine top-10
    and int8-quantized top-10 — re-ranked to a fused top-5 per query
    (operators/similarity.py::rank_fusion). Only ranks cross the
    retriever boundary (no score calibration); candidates are
    k·|queries| rows, so fusion cost is independent of corpus size.
    The RRF terms are integer divisions summed in a fixed order —
    deterministic cross-engine."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.rank_fusion(
        [
            similarity.brute_force_topk(emb, queries, k=10),
            similarity.quantized_topk(emb, queries, k=10),
        ],
        k=5,
    )


@register(
    "text_adaptive_quality_filter",
    oracle=f"""
WITH s AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(trim(text), ' '), w -> w IN ({_SW_EN})))
           / len(string_split(trim(text), ' ')) AS score
  FROM documents
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY score, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM s
)
SELECT doc_id, lang, score FROM r WHERE rn * 10 > n
""",
)
def text_adaptive_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive per-language quality filtering: drop each language's
    BOTTOM DECILE by quality score instead of one global cutoff — the
    per-domain adaptive threshold real pretraining filters use (a fixed
    stopword-ratio bar tuned on English throws away half of another
    language). The decile test is pure integer arithmetic (keep iff
    rn*10 > n) — no float threshold to diverge cross-engine; the score
    itself is an integer quotient (identical operands → identical
    double). One shuffle on lang; at 100 TB swap row_number for an
    approx_percentile cutoff per lang (mergeable sketch, no per-lang
    sort) at the cost of boundary exactness."""
    from stream_processing_project_spark.operators.text import (
        stopword_hits,
        token_count,
    )

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (stopword_hits(F.col("text"), "en") / token_count(F.col("text"))).alias(
            "score"
        ),
    )
    w_rank = Window.partitionBy("lang").orderBy("score", "doc_id")
    w_all = Window.partitionBy("lang")
    return (
        docs.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
        .filter(F.col("rn") * 10 > F.col("n"))
        .select("doc_id", "lang", "score")
    )


@register(
    "udtf_word_bigrams",
    oracle="""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w
  FROM documents WHERE doc_id % 50 = 0
)
SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, w[i] || ' ' || w[i + 1] AS bigram
FROM d, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) g
""",
)
def udtf_word_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4) correlated via LATERAL — §2.7 surface
    completion beyond pandas_udf/applyInPandas: one input row expands to
    a variable-length set of output rows with its own schema, the
    table-function shape (the reference has no extensibility at all).
    Word bigrams with positions over a document sample; whitespace
    tokenization matches the oracle's regexp split. UDTFs run
    row-batched in the Python worker — for hot paths prefer the
    equivalent explode of a codegen'd split (operators/text.py); this
    entry exists to pin the extension point."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, bigram string")
    class Bigrams:
        def eval(self, body: str):
            words = [w for w in re.split(r"\s+", body or "") if w]
            for i in range(len(words) - 1):
                yield i, words[i] + " " + words[i + 1]

    spark.udtf.register("word_bigrams", Bigrams)
    t(spark, sf_dir, "documents").filter(
        F.pmod(F.col("doc_id"), F.lit(50)) == 0
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.bigram
        FROM _udtf_docs d, LATERAL word_bigrams(d.text) b
        """
    )


@register(
    "similarity_matryoshka_topk",
    oracle="""
WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
coarse AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.v[1:16], c.v[1:16]), 6) AS prefix_cos
  FROM q, c WHERE c.vec_id <> q.vec_id
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY prefix_cos DESC NULLS LAST, neighbor_id) AS r
    FROM coarse
  ) WHERE r <= 50
),
rescored AS (
  SELECT s.query_id, s.neighbor_id,
         round(list_cosine_similarity(q.v, c.v), 6) AS cos
  FROM short s
  JOIN q ON q.vec_id = s.query_id
  JOIN c ON c.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, cos, CAST(rank AS INTEGER) AS rank FROM (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC NULLS LAST, neighbor_id) AS rank
  FROM rescored
) WHERE rank <= 5
""",
)
def similarity_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncate-then-rerank retrieval: coarse rank on the
    first 16 dims (nested-representation prefix), rerank the per-query
    top-50 shortlist with full vectors. The deterministic scale path —
    unlike LSH/IVF (hash/seed-dependent, rows-only) this one is fully
    oracle-checkable end to end, and the corpus never shuffles with
    vectors attached (ids + scalars on the wire; vectors re-join by id
    for the shortlist only)."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.matryoshka_topk(emb, emb.filter(F.col("vec_id") < 10))


@register(
    "vector_stats_hof",
    oracle="""
SELECT vec_id,
       round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6)
           AS l2_norm,
       len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_positive,
       round(list_max(embedding::DOUBLE[]), 6) AS max_dim
FROM embeddings WHERE vec_id < 100
""",
)
def vector_stats_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions over array columns — the JVM-side lambda
    surface (transform/filter/aggregate) that keeps vector math out of
    Python entirely: L2 norm via aggregate of a squared transform,
    positive-dimension count via filter, max via array_max. Same
    left-to-right fold order in both engines makes the float sums
    bit-identical; codegen'd, no UDF, no Arrow transfer — the reason
    similarity_* scores stay JVM-side at 100 TB."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq_sum = F.aggregate(
        F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )
    return emb.select(
        "vec_id",
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
        F.round(F.array_max(v), 6).alias("max_dim"),
    )


@register(
    "dedup_repeated_spans",
    oracle="""
WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
g AS (
  SELECT doc_id,
         array_to_string(toks[CAST(i AS BIGINT):CAST(i + 4 AS BIGINT)], ' ') AS gram
  FROM d, unnest(range(1, len(toks) - 3)) AS t(i)
),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
per_doc AS (
  SELECT g.doc_id, count(*) AS n_grams, count(dup.gram) AS n_dup_grams
  FROM g LEFT JOIN dup ON g.gram = dup.gram
  GROUP BY g.doc_id
)
SELECT doc.doc_id,
       CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(p.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CASE WHEN p.n_grams > 0 THEN p.n_dup_grams * 1.0 / p.n_grams
            ELSE 0.0 END AS dup_frac
FROM documents doc LEFT JOIN per_doc p ON doc.doc_id = p.doc_id
""",
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-SPAN detection (the span-level complement
    of whole-doc near-dup): every 5-token window position is checked
    against the corpus, and a document reports how much of it is built
    from spans that also occur in OTHER documents — the signal behind
    substring-level train-data dedup (boilerplate headers, license
    blocks, syndicated paragraphs that whole-doc MinHash misses because
    the surrounding text differs). Position-level counting, not
    distinct-gram counting: dup_frac approximates the fraction of the
    document covered by shared material. Shape: gram windows inline via
    sequence/slice (no intermediate explode until the corpus-wide
    count), the duplicated-gram set is the HAVING >= 2 side of one
    gram-keyed exchange, and the marking join is gram-keyed equi — at
    100 TB grams travel as xxhash64 ids (operators/text.py::
    ngram_hash_set) and the df>=2 table is Zipf-small relative to the
    corpus. Docs shorter than 5 tokens surface with n_grams = 0 via the
    final left join rather than vanishing."""
    from stream_processing_project_spark.operators.text import words

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    w = words(F.col("text"))
    grams_arr = F.when(
        F.size(w) >= 5,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 4),
            lambda i: F.array_join(F.slice(w, i, 5), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = docs.select("doc_id", F.explode(grams_arr).alias("gram")).localCheckpoint()
    dup = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram", F.lit(1).alias("is_dup"))
    )
    per_doc = (
        g.join(dup, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams_raw"),
            F.count("is_dup").alias("n_dup_raw"),
        )
    )
    return docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_grams_raw"), F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce(F.col("n_dup_raw"), F.lit(0)).cast("long").alias("n_dup_grams"),
        F.when(
            F.col("n_grams_raw") > 0,
            F.col("n_dup_raw") * 1.0 / F.col("n_grams_raw"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


@register(
    "text_span_corruption",
    oracle="""
WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
tok AS (
  SELECT doc_id, CAST(i AS BIGINT) AS p, toks[CAST(i AS BIGINT)] AS tok
  FROM d, unnest(range(1, len(toks) + 1)) AS t(i)
),
anch AS (
  SELECT doc_id, p FROM tok
  WHERE (((doc_id % 4096) * 131 + p) * 2654435761) % 4294967296 % 15 = 0
),
cov AS (
  SELECT DISTINCT a.doc_id, a.p + k.k AS p
  FROM anch a, range(0, 3) AS k(k)
),
m AS (
  SELECT t.doc_id, t.p, t.tok, c.p IS NOT NULL AS masked
  FROM tok t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.p = t.p
),
isl AS (
  SELECT doc_id, p, tok, masked, span_start,
         CASE WHEN masked THEN
           sum(CASE WHEN span_start THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING) - 1
         END AS sid
  FROM (SELECT *,
               masked AND (prev_masked IS NULL OR NOT prev_masked) AS span_start
        FROM (SELECT *, lag(masked) OVER (PARTITION BY doc_id ORDER BY p)
                          AS prev_masked
              FROM m))
),
inp AS (
  SELECT doc_id,
         string_agg(CASE WHEN NOT masked THEN tok
                         WHEN span_start THEN '<extra_id_' || sid || '>' END,
                    ' ' ORDER BY p) AS input_text
  FROM isl GROUP BY doc_id
),
tgt_spans AS (
  SELECT doc_id, sid,
         '<extra_id_' || sid || '> ' || string_agg(tok, ' ' ORDER BY p) AS s
  FROM isl WHERE masked GROUP BY doc_id, sid
),
tgt AS (
  SELECT doc_id, string_agg(s, ' ' ORDER BY sid) AS target_text,
         CAST(count(*) AS BIGINT) AS n_spans
  FROM tgt_spans GROUP BY doc_id
),
nm AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_masked
  FROM isl WHERE masked GROUP BY doc_id
)
SELECT d.doc_id, coalesce(i.input_text, '') AS input_text,
       coalesce(t.target_text, '') AS target_text,
       coalesce(t.n_spans, 0) AS n_spans,
       coalesce(nm.n_masked, 0) AS n_masked_tokens
FROM d LEFT JOIN inp i USING (doc_id) LEFT JOIN tgt t USING (doc_id)
LEFT JOIN nm USING (doc_id)
""",
)
def text_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/UL2-style SPAN-CORRUPTION pair generation — the pretraining-
    objective data prep between corpus cleaning and tokenization:
    deterministic-hash span anchors (≈1/15 of positions, 3-token spans,
    adjacent spans merge) mask ~18% of each document; the INPUT keeps
    unmasked text with each masked span replaced by its ordinal
    sentinel `<extra_id_k>`, the TARGET is the sentinel-prefixed masked
    spans in order — the exact (input, target) contract of
    encoder-decoder denoising. Anchor choice is the overflow-safe
    multiplicative hash over (doc_id, pos), so the corruption — and
    both output STRINGS — reproduce bit-for-bit cross-engine (the
    seeded-randomness stand-in the sampling family already uses).

    Shape: one token explode (the linear intermediate), anchors ×3
    coverage, gaps-and-islands span ids, two order-pinned string aggs —
    equi-joins and windows only, trivially shardable by doc at 100 TB.
    Docs with no anchored span pass through whole (empty target)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    from stream_processing_project_spark.operators.text import words

    tok = docs.select(
        "doc_id", F.posexplode(words(F.col("text"))).alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).cast("long").alias("p"), "tok")
    anch = tok.filter(
        (
            ((F.col("doc_id") % 4096) * 131 + F.col("p"))
            * F.lit(2654435761)
        )
        % F.lit(4294967296)
        % 15
        == 0
    ).select("doc_id", "p")
    cov = (
        anch.select(
            "doc_id", F.explode(F.sequence(F.col("p"), F.col("p") + 2)).alias("p")
        )
        .distinct()
        .withColumn("_m", F.lit(True))
    )
    wl = Window.partitionBy("doc_id").orderBy("p")
    m = (
        tok.join(cov, ["doc_id", "p"], "left")
        .withColumn("masked", F.col("_m").isNotNull())
        .withColumn("prev_masked", F.lag("masked").over(wl))
        .withColumn(
            "span_start",
            F.col("masked")
            & (F.col("prev_masked").isNull() | ~F.col("prev_masked")),
        )
        .withColumn(
            "sid",
            F.when(
                F.col("masked"),
                F.sum(F.col("span_start").cast("int")).over(
                    wl.rowsBetween(Window.unboundedPreceding, 0)
                )
                - 1,
            ),
        )
        .localCheckpoint(eager=False)
    )
    inp_tok = F.when(~F.col("masked"), F.col("tok")).when(
        F.col("span_start"),
        F.concat(F.lit("<extra_id_"), F.col("sid"), F.lit(">")),
    )
    inp = m.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            inp_tok.isNotNull(),
                            F.struct(F.col("p"), inp_tok.alias("t")),
                        )
                    )
                ),
                lambda s: s.getField("t"),
            ),
            " ",
        ).alias("input_text")
    )
    tgt_spans = (
        m.filter("masked")
        .groupBy("doc_id", "sid")
        .agg(
            F.concat(
                F.lit("<extra_id_"),
                F.col("sid"),
                F.lit("> "),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("p"), F.col("tok")))
                        ),
                        lambda s: s.getField("tok"),
                    ),
                    " ",
                ),
            ).alias("s")
        )
    )
    tgt = tgt_spans.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("sid"), F.col("s")))),
                lambda s: s.getField("s"),
            ),
            " ",
        ).alias("target_text"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
    )
    nm = (
        m.filter("masked")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_masked"))
    )
    return (
        docs.select("doc_id")
        .join(inp, "doc_id", "left")
        .join(tgt, "doc_id", "left")
        .join(nm, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("input_text", F.lit("")).alias("input_text"),
            F.coalesce("target_text", F.lit("")).alias("target_text"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_masked", F.lit(0)).cast("long").alias("n_masked_tokens"),
        )
    )


_XDOC_N = 8  # minimum shared-span length in tokens (Lee et al. use 50
# BPE tokens on web corpora; the fixture's seeded duplicate passages
# are shorter, and 8 whitespace tokens keeps the same geometry: long
# enough that random 8-grams over the fixture vocabulary never collide,
# so every anchor is a REAL duplicated passage)


@register(
    "dedup_cross_doc_spans",
    oracle=f"""
WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
g AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         md5(array_to_string(toks[CAST(i AS BIGINT):CAST(i + {_XDOC_N - 1} AS BIGINT)], ' ')) AS gh
  FROM d, unnest(range(1, len(toks) - {_XDOC_N - 2})) AS t(i)
),
dup AS (SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
a AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gh)),
isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NULL OR pos - prev > {_XDOC_N} THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS sid
  FROM (SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM a)
)
SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {_XDOC_N - 1} AS BIGINT) AS span_end,
       CAST(max(pos) + {_XDOC_N} - min(pos) AS BIGINT) AS span_tokens
FROM isl GROUP BY doc_id, sid
""",
)
def dedup_cross_doc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-document SUBSTRING dedup — the Lee-et-al-style
    remove-list pass (VERDICT r09 task 7), completing the dedup family's
    last modality: any ≥ _XDOC_N(= 8)-token span that also occurs verbatim in
    ANOTHER document is marked for removal, emitted as per-document
    MERGED maximal token intervals (doc_id, span_start, span_end,
    span_tokens), 1-based inclusive. This is the actionable complement
    of dedup_repeated_spans' per-doc dup FRACTION: the interval list is
    what a corpus-cleaning job actually cuts.

    Suffix-array analogue, SQL-shaped: every token position anchors an
    N-gram (sequence/slice — no per-token explode until the anchor
    table); anchors travel as md5 digests, so the gram-keyed exchange
    ships 32-byte keys, not text; the duplicated-gram set is the
    HAVING ≥ 2-distinct-docs side of ONE aggregation; marking is a
    LEFT-SEMI equi-join; interval merge is gaps-and-islands per doc
    (positions ≤ N apart coalesce, because each anchor covers
    [pos, pos+N−1] — adjacent-or-overlapping coverage is one removable
    region). Every stage is an equi-join or window — no pairwise doc
    comparison anywhere, which is what lets the pass run at corpus
    scale where suffix arrays need a machine-sized index. At 100 TB the
    gram table is the big intermediate (|tokens| rows): it never joins
    itself, only aggregates by digest (map-side partial) and semi-joins
    the Zipf-small dup set back — broadcast-able in practice."""
    from stream_processing_project_spark.operators.text import words

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    w = words(F.col("text"))
    n = _XDOC_N
    grams_arr = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.md5(F.array_join(F.slice(w, i, n), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = docs.select(
        "doc_id", F.posexplode(grams_arr).alias("p0", "gh")
    ).select("doc_id", (F.col("p0") + 1).cast("long").alias("pos"), "gh")
    g = g.localCheckpoint(eager=False)
    dup = (
        g.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gh")
    )
    anchors = g.join(dup, "gh", "left_semi").select("doc_id", "pos")
    wl = Window.partitionBy("doc_id").orderBy("pos")
    isl = (
        anchors.withColumn("prev", F.lag("pos").over(wl))
        .withColumn(
            "new_isl",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > n),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "sid",
            F.sum("new_isl").over(
                wl.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return isl.groupBy("doc_id", "sid").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + (n - 1)).cast("long").alias("span_end"),
        (F.max("pos") + n - F.min("pos")).cast("long").alias("span_tokens"),
    ).select("doc_id", "span_start", "span_end", "span_tokens")


@register(
    "dedup_cross_doc_spans_apply",
    oracle=f"""
WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
g AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         md5(array_to_string(toks[CAST(i AS BIGINT):CAST(i + {_XDOC_N - 1} AS BIGINT)], ' ')) AS gh
  FROM d, unnest(range(1, len(toks) - {_XDOC_N - 2})) AS t(i)
),
dup AS (SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
cov AS (
  SELECT DISTINCT a.doc_id, a.pos + k.k AS p
  FROM (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gh)) a,
       range(0, {_XDOC_N}) AS k(k)
),
tok AS (
  SELECT doc_id, CAST(i AS BIGINT) AS p, toks[CAST(i AS BIGINT)] AS tok
  FROM d, unnest(range(1, len(toks) + 1)) AS t(i)
),
kept AS (
  SELECT t.doc_id,
         string_agg(t.tok, ' ' ORDER BY t.p) FILTER (WHERE c.p IS NULL) AS clean_text,
         count(*) FILTER (WHERE c.p IS NULL) AS n_kept,
         count(*) FILTER (WHERE c.p IS NOT NULL) AS n_removed
  FROM tok t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.p = t.p
  GROUP BY t.doc_id
)
SELECT d.doc_id, coalesce(k.clean_text, '') AS clean_text,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_tokens_kept,
       CAST(coalesce(k.n_removed, 0) AS BIGINT) AS n_tokens_removed
FROM d LEFT JOIN kept k USING (doc_id)
""",
)
def dedup_cross_doc_spans_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY half of the cross-document substring pass (the train→score
    convention of text_classifier_train_nb/_apply_nb, here as
    detect→cut): every token covered by a ≥ _XDOC_N-token span shared
    with another document is removed and the surviving tokens re-join
    into the cleaned text — (doc_id, clean_text, n_tokens_kept,
    n_tokens_removed), every document present (untouched docs pass
    through whole). This is the actual corpus-cleaning write path; the
    span list (dedup_cross_doc_spans) is its audit view.

    Shape: anchors as in the detect pass; coverage = anchors × N
    (explode of a constant-size sequence, |anchors|·N rows, NOT
    |tokens|·N); the cut is one LEFT anti-style join of the token table
    against coverage (null-marker aggregation keeps kept/removed counts
    in the same pass); rebuild is an order-pinned string agg. At 100 TB
    the token explode is the linear intermediate and coverage is
    Zipf-small; nothing pairwise."""
    from stream_processing_project_spark.operators.text import words

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    w = words(F.col("text"))
    n = _XDOC_N
    grams_arr = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.md5(F.array_join(F.slice(w, i, n), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = docs.select(
        "doc_id", F.posexplode(grams_arr).alias("p0", "gh")
    ).select("doc_id", (F.col("p0") + 1).cast("long").alias("pos"), "gh")
    g = g.localCheckpoint(eager=False)
    dup = (
        g.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gh")
    )
    cov = (
        g.join(dup, "gh", "left_semi")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (n - 1))
            ).alias("p"),
        )
        .distinct()
        .withColumn("_cov", F.lit(1))
    )
    tok = docs.select(
        "doc_id", F.posexplode(words(F.col("text"))).alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).cast("long").alias("p"), "tok")
    kept = (
        tok.join(cov, ["doc_id", "p"], "left")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_cov").isNull(),
                                F.struct(F.col("p"), F.col("tok")),
                            )
                        )
                    ),
                    lambda s: s.getField("tok"),
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.when(F.col("_cov").isNull(), 1)).alias("n_kept"),
            F.count(F.when(F.col("_cov").isNotNull(), 1)).alias("n_removed"),
        )
    )
    return docs.join(kept, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_tokens_kept"),
        F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_tokens_removed"),
    )


def _pca_oracle(dim: int, iters: int) -> str:
    """Unrolled power-iteration oracle (the PageRank/kmeans convention):
    quantized vectors → exact-bigint scatter matrix M = n·S − sx·sxᵀ →
    normalize to ±1e6 micro-units → `iters` matrix-vector rounds, each
    renormalized to micro-units by the same double-divide-then-round
    both engines perform."""
    d1 = dim + 1
    rounds = []
    for i in range(1, iters + 1):
        p = i - 1
        rounds.append(
            f"""w{i} AS MATERIALIZED (
  SELECT mn.j, CAST(sum(mn.mn * v{p}.v) AS BIGINT) AS w
  FROM mn JOIN v{p} ON mn.k = v{p}.k GROUP BY 1
),
x{i} AS (SELECT max(abs(w)) AS mx FROM w{i}),
v{i} AS MATERIALIZED (
  SELECT j AS k,
         CAST(round(CAST(w AS DOUBLE) / mx * 1e6) AS BIGINT) AS v
  FROM w{i}, x{i}
)"""
        )
    body = ",\n".join(rounds)
    return f"""
WITH {_pca_cte_prefix(dim, iters)}
SELECT k AS dim_idx, v AS loading_micro FROM v{iters}
"""


def _pca_cte_prefix(dim: int, iters: int) -> str:
    """The PCA power-iteration pipeline as a reusable CTE prefix (no
    final SELECT): quantized vectors q, count nn, per-dim sums sx,
    normalized scatter mn, and iterates v0..v{iters} — composed by both
    the PCA probe's oracle and the ABTT post-processor's."""
    d1 = dim + 1
    rounds = []
    for i in range(1, iters + 1):
        p = i - 1
        rounds.append(
            f"""w{i} AS MATERIALIZED (
  SELECT mn.j, CAST(sum(mn.mn * v{p}.v) AS BIGINT) AS w
  FROM mn JOIN v{p} ON mn.k = v{p}.k GROUP BY 1
),
x{i} AS (SELECT max(abs(w)) AS mx FROM w{i}),
v{i} AS MATERIALIZED (
  SELECT j AS k,
         CAST(round(CAST(w AS DOUBLE) / mx * 1e6) AS BIGINT) AS v
  FROM w{i}, x{i}
)"""
        )
    body = ",\n".join(rounds)
    return f"""q AS (
  SELECT vec_id,
         list_transform(range(1, {d1}),
           d -> CAST(round(v[d] * 1024.0) AS BIGINT)) AS qq
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
),
nn AS (SELECT count(*) AS n FROM q),
longq AS (
  SELECT vec_id, dt.d AS j, qq[dt.d] AS qj FROM q, range(1, {d1}) dt(d)
),
s2 AS (
  SELECT a.j AS j, b.j AS k, CAST(sum(a.qj * b.qj) AS BIGINT) AS s
  FROM longq a JOIN longq b USING (vec_id) GROUP BY 1, 2
),
sx AS (SELECT j, CAST(sum(qj) AS BIGINT) AS sx FROM longq GROUP BY 1),
m AS (
  SELECT s2.j, s2.k, nn.n * s2.s - sj.sx * sk.sx AS mval
  FROM s2
  JOIN sx sj ON s2.j = sj.j
  JOIN sx sk ON s2.k = sk.j, nn
),
mx0 AS (SELECT max(abs(mval)) AS mx FROM m),
mn AS MATERIALIZED (
  SELECT j, k,
         CAST(round(CAST(mval AS DOUBLE) / mx * 1e6) AS BIGINT) AS mn
  FROM m, mx0
),
v0 AS (SELECT dt.d AS k, CAST(1000000 AS BIGINT) AS v FROM range(1, {d1}) dt(d)),
{body}"""


def pca_normalized_scatter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-sized half of PCA power iteration, shared with its plan
    pin (tests/test_plan_properties.py): quantized vectors → pair
    fan-out via nested generates on the SAME row (no self-join) → ONE
    partial-aggregated (j, k) co-moment pass → centered scatter
    M = n·S − sx·sxᵀ (exact bigint) → ±1e6 micro-unit normalization by
    double-divide-then-round (identical in the oracle)."""
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1024.0)"
            " AS BIGINT))"
        ).alias("qq"),
    )
    longq = q.select(
        "vec_id", F.posexplode("qq").alias("j0", "qj")
    ).select("vec_id", (F.col("j0") + 1).alias("j"), "qj")
    # pair fan-out WITHOUT a self-join: second generate over the same row
    pairs = (
        q.select("vec_id", "qq", F.posexplode("qq").alias("j0", "qj"))
        .select("vec_id", (F.col("j0") + 1).alias("j"), "qj",
                F.posexplode("qq").alias("k0", "qk"))
        .select("j", (F.col("k0") + 1).alias("k"),
                (F.col("qj") * F.col("qk")).alias("prod"))
    )
    s2 = pairs.groupBy("j", "k").agg(F.sum("prod").alias("s"))
    sx = longq.groupBy("j").agg(F.sum("qj").alias("sx"))
    nn = q.agg(F.count(F.lit(1)).alias("n"))
    m = (
        s2.join(F.broadcast(sx.withColumnRenamed("sx", "sxj")), "j")
        .join(
            F.broadcast(
                sx.withColumnRenamed("j", "k").withColumnRenamed("sx", "sxk")
            ),
            "k",
        )
        .crossJoin(F.broadcast(nn))
        .select(
            "j",
            "k",
            (F.col("n") * F.col("s") - F.col("sxj") * F.col("sxk")).alias("mval"),
        )
    )
    mx0 = m.agg(F.max(F.abs(F.col("mval"))).alias("mx"))
    return m.crossJoin(F.broadcast(mx0)).select(
        "j",
        "k",
        F.round(F.col("mval").cast("double") / F.col("mx") * 1e6, 0)
        .cast("long")
        .alias("mn"),
    )


def _round_away(x: float) -> int:
    """Round-half-away-from-zero, exact at every boundary: compares the
    EXACT fractional part (x − floor(x) is exactly representable for
    |x| < 2^52, and IEEE subtraction of representable results is exact)
    instead of testing floor(x + 0.5), whose addition can round up at
    values like 0.49999999999999994. Matches DuckDB round(DOUBLE) and
    Spark's HALF_UP on the same double."""
    import math

    if x >= 0:
        n = math.floor(x)
        return int(n) + (1 if x - n >= 0.5 else 0)
    n = math.ceil(x)
    return int(n) - (1 if n - x >= 0.5 else 0)


@register("vector_pca_power_iteration", oracle=_pca_oracle(64, 200))
def vector_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal component of the embedding corpus by POWER
    ITERATION — the embedding-drift / anisotropy probe (a collapsing
    embedding space shows one direction swallowing the variance; PCA
    whitening and ABTT-style postprocessing both start from exactly
    this vector), and the engine's fourth iterative-ML family next to
    PageRank, Lloyd's k-means, and BPE. DISTRIBUTED SHAPE: the only
    data-sized pass is the scatter-matrix accumulation — vectors
    quantized ×1024 to exact ints, the d² co-moment sums S_jk and the
    d column sums collected by ONE map-side-combined aggregate (each
    partition collapses to ≤ d² partials — the sufficient-statistics
    pattern at matrix rank; at 100 TB the same d²-row stats merge
    associatively across shards/days). The centered scatter matrix
    M = n·S − sx·sxᵀ is then d² = 4096 rows — sketch-sized by
    construction (bounded by dimension, not data) — so the 200
    matrix-vector rounds fold driver-side over the collected matrix,
    the BPE merge-rule pattern for iteration over bounded state.
    WHY 200: convergence is paced by the eigen-gap, not data volume —
    the near-isotropic fixture embeddings have |λ2/λ1| ≈ 0.987, so
    ~200 rounds reach the dominant eigenvector (alignment with an
    independent numpy eigendecomposition is pinned > 0.999 in
    tests/test_r03_cont_properties.py); rounds cost O(d²) each,
    nothing re-touches the corpus.
    DETERMINISM: M is exact bigint; each round rescales to ±1e6
    micro-units via the identical double-divide-then-round in both
    engines, so every iterate is integer and the unrolled-SQL oracle
    reproduces the training bit for bit (the kmeans/PageRank oracle
    convention). Output: the 64 integer micro-unit loadings of the
    dominant component (sign = the power-iteration seed's, all-ones)."""
    mn = pca_normalized_scatter(spark, sf_dir)
    # The normalized scatter matrix is d² = 4096 rows — bounded by the
    # embedding DIMENSION, not the corpus — so the three matrix-vector
    # rounds fold driver-side (the BPE merge-rule precedent: collect is
    # legitimate when the table is sketch-sized by construction; at
    # d ≈ 1536 it is still < 2.4M ints). Arithmetic mirrors the oracle
    # exactly: integer dot products, then round-half-away-from-zero of
    # the double quotient ×1e6.
    vec = _pca_dominant_fold(mn)
    return spark.createDataFrame(
        [(int(k), int(v_)) for k, v_ in sorted(vec.items())],
        "dim_idx bigint, loading_micro bigint",
    )


def _pca_dominant_fold(mn, iters: int = 200) -> dict[int, int]:
    """Driver-side power-iteration fold over the collected normalized
    scatter (d² rows — sketch-sized by construction); returns
    {dim 1..d: integer micro-unit loading}. Shared by the PCA probe and
    the ABTT post-processor; arithmetic mirrors the unrolled-SQL oracle
    exactly (integer dots, round-half-away of the double quotient)."""
    mat: dict[tuple[int, int], int] = {
        (r["j"], r["k"]): r["mn"] for r in mn.collect()
    }
    if not mat:  # empty corpus → no component
        return {}
    dims = sorted({j for j, _ in mat})
    vec = {k: 1_000_000 for k in dims}
    for _ in range(iters):
        w = {
            j: sum(mat[(j, k)] * vec[k] for k in dims if (j, k) in mat)
            for j in dims
        }
        mxw = max(abs(x) for x in w.values())
        vec = {j: _round_away(float(x) / mxw * 1e6) for j, x in w.items()}
    return vec


@register(
    "multimodal_decode_real",
    oracle="""
WITH ids AS (SELECT doc_id FROM documents),
img AS (
  SELECT doc_id, 'image' AS kind,
         CAST(2 + doc_id % 5 AS BIGINT) AS width,
         CAST(3 + doc_id % 7 AS BIGINT) AS height,
         CAST(1 AS BIGINT) AS n_frames,
         CAST(0 AS BIGINT) AS sample_rate,
         CAST(doc_id % 256 AS BIGINT) AS top_val,
         CAST(list_sum(list_transform(range(3 + doc_id % 7),
                                      y -> (doc_id + y) % 256)) * 1000
              // (3 + doc_id % 7) AS BIGINT) AS stat_milli
  FROM ids WHERE doc_id % 3 = 0
),
aud AS (
  SELECT doc_id, 'audio' AS kind,
         CAST(0 AS BIGINT) AS width, CAST(0 AS BIGINT) AS height,
         CAST(800 + doc_id % 800 AS BIGINT) AS n_frames,
         CAST(8000 AS BIGINT) AS sample_rate,
         CAST((doc_id * 7) % 2001 - 1000 AS BIGINT) AS top_val,
         CAST(list_sum(list_transform(range(800 + doc_id % 800),
                                      i -> abs((doc_id * 7 + i) % 2001 - 1000)))
              * 1000 // (800 + doc_id % 800) AS BIGINT) AS stat_milli
  FROM ids WHERE doc_id % 3 = 1
)
SELECT * FROM img UNION ALL SELECT * FROM aud
""",
)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode, fully value-hash-oracled — the codec gate
    made concrete (operators/multimodal.py r04): deterministic BMP and
    WAV payloads are SYNTHESIZED as genuine container bytes
    (struct-packed headers, 4-byte-padded bottom-up BMP rows, RIFF
    chunk layout with a decoy LIST chunk), then DECODED by real
    parsers — header unpack, chunk walking, padding-aware numpy pixel
    extraction, int16 PCM — and reduced to per-asset statistics. The
    payloads follow a closed-form generative model of doc_id, so
    DuckDB recomputes every decoded statistic symbolically: any codec
    bug (stride off-by-one, missed bottom-up flip, chunk misparse)
    breaks the hash. Shape: both synth and decode are mapInPandas over
    Arrow batches — payload bytes live only inside tasks, the
    data-sized stages are two narrow passes, and a real-codec swap
    (PIL/ffmpeg for compressed formats) changes only the per-row
    parser functions."""
    from stream_processing_project_spark.operators.multimodal import (
        decode_real_media,
        synthesize_real_media,
    )

    docs = t(spark, sf_dir, "documents")
    return decode_real_media(synthesize_real_media(docs))


@register(
    "multimodal_phash_neardup",
    oracle="""
WITH imgs AS (
  SELECT doc_id, 3 + doc_id % 7 AS h,
         list_transform(range(3 + doc_id % 7), y -> (doc_id + y) % 256) AS vs
  FROM documents WHERE doc_id % 3 = 0
),
hashed AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(60),
              i -> CASE WHEN vs[((i * h) // 60) + 1] * 1000
                             > (list_sum(vs) * 1000) // h
                        THEN CAST(1 AS BIGINT) << i ELSE 0 END))
              AS BIGINT) AS phash
  FROM imgs
),
classes AS (
  SELECT phash, CAST(count(*) AS BIGINT) AS n, min(doc_id) AS min1
  FROM hashed GROUP BY phash
),
m2 AS (
  SELECT h.phash, min(h.doc_id) AS min2
  FROM hashed h JOIN classes c ON c.phash = h.phash AND h.doc_id > c.min1
  GROUP BY h.phash
),
cpairs AS (
  SELECT a.phash AS pa, b.n AS nb, b.min1 AS minb
  FROM classes a JOIN classes b ON a.phash <> b.phash
  WHERE bit_count(xor(a.phash, b.phash)) <= 3
),
neigh AS (
  SELECT pa, CAST(sum(nb) AS BIGINT) AS neigh_n, min(minb) AS neigh_min
  FROM cpairs GROUP BY pa
)
SELECT h.doc_id,
       CAST(c.n - 1 + coalesce(g.neigh_n, 0) AS BIGINT) AS n_near,
       CAST(CASE
         WHEN c.n > 1 THEN
           CASE WHEN g.neigh_min IS NULL
                THEN (CASE WHEN h.doc_id = c.min1 THEN m.min2 ELSE c.min1 END)
                ELSE least(CASE WHEN h.doc_id = c.min1 THEN m.min2
                                ELSE c.min1 END, g.neigh_min) END
         ELSE g.neigh_min END AS BIGINT) AS nearest_id
FROM hashed h
JOIN classes c ON c.phash = h.phash
LEFT JOIN m2 m ON m.phash = h.phash
LEFT JOIN neigh g ON g.pa = h.phash
WHERE c.n - 1 + coalesce(g.neigh_n, 0) > 0
""",
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over REAL image bytes —
    the image-dedup stage of a multimodal curation pipeline: a 60-bit
    average-hash is computed from each DECODED BMP's actual pixel rows
    (operators/multimodal.py::phash60, mapInPandas — payloads never
    leave tasks), then near-dups at Hamming <= 3 are found by 4-band x
    15-bit LSH + exact verify AT THE DISTINCT-HASH CLASS LEVEL —
    identical hashes collapse to one class row before any pairing, so
    heavy duplication (the fixture has ~500-member classes at sf1)
    never creates member-level pair explosions; members get their
    counts back through a linear broadcast map-back. The banding is
    LOSSLESS at this radius by pigeonhole (3 flipped bits corrupt at
    most 3 of 4 bands), which is what lets the brute-force closed-form
    class-level oracle match the bucketed plan EXACTLY — same
    guarantee scale-wise as MinHash LSH: the candidate join exchanges
    hashes through band buckets, never pixels or member pairs. The payloads
    follow the closed-form generative model of doc_id, so DuckDB
    recomputes every hash symbolically: any decode or hash bug breaks
    the value hash."""
    from stream_processing_project_spark.operators.multimodal import (
        phash_neardup,
        synthesize_real_media,
    )

    docs = t(spark, sf_dir, "documents")
    media = synthesize_real_media(docs).filter(F.col("kind") == "image")
    return phash_neardup(media)


@register(
    "vector_random_projection_jl",
    oracle="""
WITH mat AS (
  SELECT i.i, j.j,
         CASE WHEN CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR) || ':'
                         || CAST(j.j AS VARCHAR)), 1, 15)) AS BIGINT)
                   % 2 = 0
              THEN 1 ELSE -1 END AS sgn
  FROM range(0, 64) i(i), range(0, 16) j(j)
),
x AS (
  SELECT vec_id, i.i,
         CAST(round(embedding[i.i + 1] * 1e6) AS BIGINT) AS xm
  FROM embeddings, range(0, 64) i(i)
),
y AS (
  SELECT x.vec_id, m.j, CAST(sum(m.sgn * x.xm) AS BIGINT) AS proj_micro
  FROM x JOIN mat m ON m.i = x.i
  GROUP BY x.vec_id, m.j
),
nx AS (SELECT vec_id, CAST(sum(xm * xm) AS BIGINT) AS sx FROM x GROUP BY vec_id),
ny AS (SELECT vec_id, CAST(sum(proj_micro * proj_micro) AS BIGINT) AS sy
       FROM y GROUP BY vec_id)
SELECT y.vec_id, y.j, y.proj_micro,
       CAST(ny.sy AS DOUBLE) / (16.0 * CAST(nx.sx AS DOUBLE)) AS norm_ratio
FROM y JOIN nx ON nx.vec_id = y.vec_id JOIN ny ON ny.vec_id = y.vec_id
""",
)
def vector_random_projection_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 -> 16 dims with a
    norm-preservation audit — the dimension reducer that needs NO
    training pass (contrast vector_pca_power_iteration): a +-1
    Achlioptas sign matrix drawn deterministically from the
    cross-engine md5-prefix hash, so both engines replay the identical
    matrix and the projection value-hash-oracles. Embedding elements
    micro-quantize to exact bigints BEFORE any arithmetic, so every
    projected coordinate is an exact signed integer sum (no float
    order anywhere); the audit ratio ||y||^2 / (k * ||x||^2) — the JL
    lemma's concentration target, ~1 per vector — is one raw
    fixed-order double division at the end. Plan shape: the d x k = 
    1024-row sign matrix materializes ONCE and broadcasts; the
    posexploded corpus fan-outs through the broadcast equi-join on the
    source dim (k rows per element — dense mat-vec, the inherent JL
    cost), then ONE map-side-combined rollup keyed (vec, target-dim).
    At 100 TB nothing shuffles but (vec, j) partial sums; the matrix
    never re-derives per row. Feeds the ANN family: project first,
    then LSH/IVF the 16-dim codes at 4x less exchange volume."""
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    x = e.select(
        "vec_id",
        F.posexplode("embedding").alias("i", "xv"),
    ).select(
        "vec_id",
        "i",
        F.round(F.col("xv").cast("double") * 1e6, 0).cast("bigint").alias("xm"),
    )
    mat = (
        spark.range(64)
        .select(F.col("id").cast("int").alias("i"))
        .crossJoin(spark.range(16).select(F.col("id").cast("int").alias("j")))
        .select(
            "i",
            "j",
            F.when(
                F.expr(
                    "CAST(conv(substr(md5(concat(CAST(i AS STRING), ':',"
                    " CAST(j AS STRING))), 1, 15), 16, 10) AS BIGINT) % 2 = 0"
                ),
                1,
            )
            .otherwise(-1)
            .alias("sgn"),
        )
    )
    y = (
        x.join(F.broadcast(mat), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("sgn") * F.col("xm")).cast("bigint").alias("proj_micro"))
        .localCheckpoint()  # reused by the output join and the norm audit
    )
    nx = x.groupBy("vec_id").agg(
        F.sum(F.col("xm") * F.col("xm")).cast("bigint").alias("sx")
    )
    ny = y.groupBy("vec_id").agg(
        F.sum(F.col("proj_micro") * F.col("proj_micro")).cast("bigint").alias("sy")
    )
    return (
        y.join(nx, "vec_id")
        .join(ny, "vec_id")
        .select(
            "vec_id",
            "j",
            "proj_micro",
            (
                F.col("sy").cast("double") / (16.0 * F.col("sx").cast("double"))
            ).alias("norm_ratio"),
        )
    )


@register(
    "similarity_ann_recall_at_k",
    oracle="""
WITH dz AS (
  SELECT vec_id, v, list_transform(range(1, 65), d -> CAST(round(v[d] * 1048576.0) AS BIGINT)) AS qq
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
),
coded AS (
  SELECT vec_id, v,
    list_sum(list_transform(range(0, 8), p ->
      (CASE WHEN list_sum(list_transform(range(1, 65), d ->
         (CASE WHEN ((p * 997 + d) * 2654435761) % 4294967296 >= 2147483648 THEN -1 ELSE 1 END) * qq[d]
      )) > 0 THEN 1 ELSE 0 END) * (1 << (7 - p))
    )) AS bucket
  FROM dz
),
probes AS (
  SELECT vec_id AS query_id,
         unnest(list_prepend(bucket, list_transform(range(0, 8), j -> xor(bucket, 1 << j)))) AS bucket
  FROM coded WHERE vec_id < 10
),
cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
  FROM probes p JOIN coded c ON p.bucket = c.bucket AND c.vec_id <> p.query_id
),
scored AS (
  SELECT ca.query_id, ca.neighbor_id,
         round(list_cosine_similarity(q.v, c.v), 6) AS cos
  FROM cand ca JOIN dz q ON q.vec_id = ca.query_id JOIN dz c ON c.vec_id = ca.neighbor_id
),
ann AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC NULLS LAST, neighbor_id) AS rank
    FROM scored
  ) WHERE rank <= 5
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY round(list_cosine_similarity(q.v, c.v), 6) DESC NULLS LAST, c.vec_id) AS rank
    FROM dz q, dz c
    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
  ) WHERE rank <= 5
),
hits AS (
  SELECT a.query_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM ann a JOIN exact e
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY a.query_id
)
SELECT n.query_id, n.n_ann,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       (CAST(COALESCE(h.n_hits, 0) AS BIGINT) * 1000000) // 5 AS recall_micro
FROM (SELECT query_id, CAST(count(*) AS BIGINT) AS n_ann FROM ann GROUP BY query_id) n
LEFT JOIN hits h ON n.query_id = h.query_id
""",
)
def similarity_ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality audit: recall@5 of the deterministic LSH index
    against brute-force exact cosine ground truth, per query — the
    eval every ANN deployment runs before trusting the index (and the
    number that decides bits/probes tuning). Composes the two existing
    paths (`ann_lsh_topk_oracled`, `brute_force_topk`) and reduces to
    exact integers: n_ann (LSH may return < k when the probed buckets
    run dry — itself a signal), n_hits = |ANN ∩ exact|, and
    micro-quantized recall via integer div — no floats, value-hash
    stable. Scale: ground truth is O(|Q|·|corpus|) by definition, so
    the audit runs over a SAMPLED query panel (here vec_id < 10) —
    the standard recall-estimation protocol; the index side stays
    bucket-pruned equi-joins."""
    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    ann = similarity.ann_lsh_topk_oracled(emb, q, k=5).select(
        "query_id", "neighbor_id"
    )
    exact = similarity.brute_force_topk(emb, q, k=5).select(
        "query_id", "neighbor_id"
    )
    hits = (
        ann.join(exact, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    n_ann = ann.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_ann"))
    return n_ann.join(hits, "query_id", "left").select(
        "query_id",
        "n_ann",
        F.coalesce(F.col("h"), F.lit(0)).cast("bigint").alias("n_hits"),
        F.expr("(CAST(coalesce(h, 0) AS BIGINT) * 1000000) div 5")
        .cast("bigint")
        .alias("recall_micro"),
    )


@register(
    "multimodal_audio_segments",
    oracle="""
WITH aud AS (
  SELECT doc_id, 800 + doc_id % 800 AS n FROM documents WHERE doc_id % 3 = 1
),
fr AS (
  SELECT doc_id, n, unnest(range((n + 159) // 160)) AS f FROM aud
),
en AS (
  SELECT doc_id, f,
         CAST(least(160, n - f * 160) AS BIGINT) AS ns,
         CAST(list_sum(list_transform(range(f * 160, least(n, (f + 1) * 160)),
              i -> abs((doc_id * 7 + i) % 2001 - 1000))) AS BIGINT) AS sum_abs
  FROM fr
),
act AS (SELECT doc_id, f, (sum_abs > 500 * ns) AS a FROM en),
flag AS (
  SELECT doc_id, f, a,
         CASE WHEN a AND NOT coalesce(lag(a) OVER w, FALSE)
              THEN 1 ELSE 0 END AS s
  FROM act WINDOW w AS (PARTITION BY doc_id ORDER BY f)
),
runs AS (
  SELECT doc_id, f, a,
         CAST(sum(s) OVER (PARTITION BY doc_id ORDER BY f
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rid
  FROM flag
),
runlen AS (
  SELECT doc_id, rid, CAST(count(*) AS BIGINT) AS len
  FROM runs WHERE a GROUP BY 1, 2
),
perdoc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_frames,
         CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_active
  FROM runs GROUP BY 1
)
SELECT p.doc_id, p.n_frames, p.n_active,
       CAST(coalesce(r.n_seg, 0) AS BIGINT) AS n_segments,
       CAST(coalesce(r.longest, 0) AS BIGINT) AS longest_run
FROM perdoc p
LEFT JOIN (
  SELECT doc_id, count(*) AS n_seg, max(len) AS longest
  FROM runlen GROUP BY 1
) r ON r.doc_id = p.doc_id
""",
)
def multimodal_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-based audio activity segmentation over REAL decoded WAV
    PCM — the voice-activity-detection shape every speech-data
    pipeline runs before transcription (drop silence, split long
    audio into utterance-sized training clips): 20 ms frames (160
    samples at 8 kHz), exact integer frame energy Σ|s|, a frame is
    ACTIVE when mean |amplitude| exceeds 500 (sum_abs > 500·n — an
    integer compare, short tail frames unpenalized), and segments are
    maximal active runs found by declarative gaps-and-islands (flag
    run starts by lag(), cumsum run ids, one count per run). The
    codec pass is the real RIFF chunk walker (decoy-LIST-proof) in
    mapInPandas (operators/multimodal.py::audio_frame_energy); the
    payloads follow the closed-form generative model, so DuckDB
    recomputes every frame energy and every run SYMBOLICALLY — a
    stride bug, a chunk misparse, or an off-by-one in the run logic
    breaks the value hash. Scale shape: frames table is slim (4
    integer cols, ~6 rows per audio second); windows partition by
    doc_id (clip-sized partitions); the report is one row per asset.
    Production swap: real VAD replaces the threshold, same plan."""
    from stream_processing_project_spark.operators.multimodal import (
        audio_frame_energy,
        synthesize_real_media,
    )

    docs = t(spark, sf_dir, "documents")
    media = synthesize_real_media(docs).filter(F.col("kind") == "audio")
    en = audio_frame_energy(media)
    wd = Window.partitionBy("doc_id").orderBy("frame_idx")
    act = en.select(
        "doc_id",
        "frame_idx",
        (F.col("sum_abs") > F.lit(500) * F.col("n_samples")).alias("a"),
    )
    flag = act.withColumn(
        "s",
        F.when(
            F.col("a") & ~F.coalesce(F.lag("a").over(wd), F.lit(False)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    runs = flag.withColumn(
        "rid",
        F.sum("s")
        .over(wd.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint"),
    )
    runlen = (
        runs.filter(F.col("a"))
        .groupBy("doc_id", "rid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("len"))
    )
    perdoc = runs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum(F.when(F.col("a"), F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_active"),
    )
    segs = runlen.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_seg"), F.max("len").alias("longest")
    )
    return perdoc.join(segs, "doc_id", "left").select(
        "doc_id",
        "n_frames",
        "n_active",
        F.coalesce(F.col("n_seg"), F.lit(0)).cast("bigint").alias("n_segments"),
        F.coalesce(F.col("longest"), F.lit(0))
        .cast("bigint")
        .alias("longest_run"),
    )


@register(
    "dedup_lsh_quality_audit",
    oracle="""
WITH words AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
  WHERE len(string_split(trim(text), ' ')) >= 2
),
sh0 AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(generate_series(1, len(ws) - 1),
                i -> concat(ws[i], ' ', ws[i + 1])))) AS sh
  FROM words
),
rare AS (
  SELECT * FROM sh0
  WHERE sh IN (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 100)
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM rare
          GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS c
  FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT doc_a, doc_b
  FROM common JOIN sizes sa ON sa.doc_id = doc_a
              JOIN sizes sb ON sb.doc_id = doc_b
  WHERE 3 * c >= sa.n_sh + sb.n_sh
),
h0 AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(sh), 1, 12)) AS BIGINT) AS h FROM rare
),
sig AS (
  SELECT doc_id, p.p,
         CAST(min((h * (2 * p.p + 3) + 1000003 * p.p) % 281474976710656)
              AS BIGINT) AS mh
  FROM h0 CROSS JOIN (SELECT unnest(range(32)) AS p) p
  GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, p // 4 AS b,
         string_agg(CAST(mh AS VARCHAR), ':' ORDER BY p) AS bh
  FROM sig GROUP BY doc_id, p // 4
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh
       AND a.doc_id < b.doc_id
),
est AS (
  SELECT c.doc_a, c.doc_b,
         CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT)
           AS matches
  FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a
       JOIN sig sb ON sb.doc_id = c.doc_b AND sb.p = sa.p
  GROUP BY 1, 2
),
keep AS (SELECT doc_a, doc_b FROM est WHERE matches >= 16),
m AS (
  SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
    (SELECT CAST(count(*) AS BIGINT) FROM keep) AS n_candidates,
    (SELECT CAST(count(*) AS BIGINT) FROM keep k
      JOIN truth t ON t.doc_a = k.doc_a AND t.doc_b = k.doc_b) AS n_hits,
    (SELECT CAST(count(*) AS BIGINT) FROM sh0) AS n_sh_total,
    (SELECT CAST(count(*) AS BIGINT) FROM rare) AS n_sh_rare
)
SELECT n_truth, n_candidates, n_hits,
       CASE WHEN n_candidates > 0
            THEN CAST(n_hits AS DOUBLE) / CAST(n_candidates AS DOUBLE) END
         AS precision,
       CASE WHEN n_truth > 0
            THEN CAST(n_hits AS DOUBLE) / CAST(n_truth AS DOUBLE) END
         AS recall,
       CASE WHEN n_sh_total > 0
            THEN CAST(n_sh_total - n_sh_rare AS DOUBLE)
                 / CAST(n_sh_total AS DOUBLE)
            ELSE 0.0 END AS capped_fraction
FROM m
""",
)
def dedup_lsh_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pipeline QUALITY audit — precision/recall of banded
    MinHash-LSH against exact set Jaccard on the SAME capped shingle
    sets (the eval every dedup deployment needs before trusting LSH
    at 100 TB, the dedup twin of similarity_ann_recall_at_k). Unlike
    dedup_minhash_lsh (xxhash64 — engine-specific, rows-only check),
    this audit's MinHash is FULLY value-hash-oracled: one md5 base
    hash per shingle, 32 permutations by affine integer mixing
    (h·(2p+3) + 1000003p mod 2^48 — products < 2^55, exact bigints,
    the CMS hash-family idiom), 8×4 banding on ordered signature
    strings, candidate pairs kept at est-Jaccard ≥ 16/32 (an INTEGER
    match-count compare), truth pairs at true Jaccard ≥ 1/2 via
    3·common ≥ |a|+|b| (integer — no float Jaccard anywhere). Both
    sides share the df ≤ 100 cap, so the audit is apples-to-apples
    and the hot-shingle quadratic blowup is pruned before any join.
    `capped_fraction` reports the share of shingle INSTANCES the df
    cap removed — a 0-pair audit at capped_fraction ≈ 1.0 means the
    cap consumed the corpus (every shingle hot — the degenerate
    sf10 replicated-fixture case), not that the corpus is clean;
    deployments should alarm on it before trusting precision/recall.
    Shape: signatures are |docs|×32 bigints built in one rollup; the
    band self-join carries ids only; the match-count join runs on
    CANDIDATE pairs × 32, never all pairs. Output: one row —
    n_truth, n_candidates, n_hits, precision, recall."""
    docs = t(spark, sf_dir, "documents")
    from stream_processing_project_spark.operators.dedup import _bigrams

    sh0 = _bigrams(docs)
    # The FIXED df cap is the scaling lever, exactly as in
    # ngram_jaccard_pairs: the exact-truth self-join fans out df^2
    # pairs per shingle, so an absolute bound (<=100 docs) caps the
    # truth-side work at 1e4 pairs/shingle at ANY corpus size. On the
    # 31-word replicated synthetic corpus every bigram goes hot past
    # ~sf1 and the capped sets empty (the sf10 curve returns 0 pairs)
    # — an artifact of the tiny fixture vocabulary, not the operator:
    # real web corpora are Zipf/hapax-heavy (see text_zipf_fit /
    # text_lexical_diversity), so df<=100 shingles exist at every
    # scale. (A corpus-RELATIVE cap was tried and reverted: it makes
    # the truth join quadratic on hot shingles — measured as a
    # non-terminating sf10 run.)
    rare = sh0.join(
        sh0.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 100),
        "sh",
        "left_semi",
    ).persist()  # feeds sizes, common (both sides), and the signature rollup
    sizes = rare.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sh")
    )
    a = rare.select(F.col("doc_id").alias("doc_a"), "sh")
    b = rare.select(F.col("doc_id").alias("doc_b"), "sh")
    common = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    truth = (
        common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")),
            "doc_b",
        )
        .filter(F.lit(3) * F.col("c") >= F.col("n_a") + F.col("n_b"))
        .select("doc_a", "doc_b")
    )
    h0 = rare.select(
        "doc_id",
        F.conv(F.substring(F.md5("sh"), 1, 12), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    sig = (
        h0.select(
            "doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("p")
        )
        .groupBy("doc_id", "p")
        .agg(
            F.min(
                (
                    F.col("h") * (F.lit(2) * F.col("p") + F.lit(3))
                    + F.lit(1000003) * F.col("p")
                )
                % F.lit(281474976710656)
            )
            .cast("bigint")
            .alias("mh")
        )
        .persist()  # feeds banding and the per-pair match count
    )
    bands = sig.groupBy(
        "doc_id", F.expr("p div 4").alias("b")
    ).agg(
        F.concat_ws(
            ":",
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "mh"))),
                lambda x: x["mh"].cast("string"),
            ),
        ).alias("bh")
    )
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.b") == F.col("y.b"))
            & (F.col("x.bh") == F.col("y.bh"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    est = (
        cand.join(
            sig.select(F.col("doc_id").alias("doc_a"), "p", F.col("mh").alias("mha")),
            "doc_a",
        )
        .join(
            sig.select(F.col("doc_id").alias("doc_b"), "p", F.col("mh").alias("mhb")),
            ["doc_b", "p"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(
                F.when(F.col("mha") == F.col("mhb"), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("matches")
        )
    )
    keep = est.filter(F.col("matches") >= 16).select("doc_a", "doc_b")
    n_truth = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    n_cand = keep.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
    n_hits = keep.join(truth, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits")
    )
    # cap-saturation signal: both counts are 1-row aggregates of tables
    # the plan already materializes (sh0 feeds rare; rare is persisted)
    n_sh = sh0.agg(F.count(F.lit(1)).cast("bigint").alias("n_sh_total"))
    n_rare = rare.agg(F.count(F.lit(1)).cast("bigint").alias("n_sh_rare"))
    return (
        n_truth.crossJoin(n_cand)
        .crossJoin(n_hits)
        .crossJoin(n_sh)
        .crossJoin(n_rare)
        .select(
            "n_truth",
            "n_candidates",
            "n_hits",
            F.when(
                F.col("n_candidates") > 0,
                F.col("n_hits").cast("double")
                / F.col("n_candidates").cast("double"),
            ).alias("precision"),
            F.when(
                F.col("n_truth") > 0,
                F.col("n_hits").cast("double") / F.col("n_truth").cast("double"),
            ).alias("recall"),
            F.when(
                F.col("n_sh_total") > 0,
                (F.col("n_sh_total") - F.col("n_sh_rare")).cast("double")
                / F.col("n_sh_total").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("capped_fraction"),
        )
    )


@register(
    "vector_centroid_drift",
    oracle="""
WITH x AS (
  SELECT label, vec_id % 2 AS snap, i.i,
         CAST(round(embedding[i.i + 1] * 1e6) AS BIGINT) AS xm
  FROM embeddings, range(0, 64) i(i)
),
s AS (
  SELECT label, snap, i, CAST(sum(xm) AS BIGINT) AS sm,
         CAST(count(*) AS BIGINT) AS n
  FROM x GROUP BY 1, 2, 3
),
wide AS (
  SELECT o.label, o.i, o.n AS n_old, nw.n AS n_new,
         (CAST(o.sm AS DOUBLE) / 1e6) / o.n AS co,
         (CAST(nw.sm AS DOUBLE) / 1e6) / nw.n AS cn
  FROM s o JOIN s nw ON nw.label = o.label AND nw.i = o.i AND nw.snap = 1
  WHERE o.snap = 0
),
terms AS (
  SELECT label, n_old, n_new,
         CAST(round((co - cn) * (co - cn) * 1e6) AS BIGINT) AS d2,
         CAST(round(co * cn * 1e6) AS BIGINT) AS p,
         CAST(round(co * co * 1e6) AS BIGINT) AS q1,
         CAST(round(cn * cn * 1e6) AS BIGINT) AS q2
  FROM wide
),
g AS (
  SELECT label, CAST(max(n_old) AS BIGINT) AS n_old,
         CAST(max(n_new) AS BIGINT) AS n_new,
         CAST(sum(d2) AS BIGINT) AS dsum, CAST(sum(p) AS BIGINT) AS psum,
         CAST(sum(q1) AS BIGINT) AS q1sum, CAST(sum(q2) AS BIGINT) AS q2sum
  FROM terms GROUP BY 1
)
SELECT label, n_old, n_new,
       CAST(dsum AS DOUBLE) / 1e6 AS drift_l2_sq,
       (CAST(psum AS DOUBLE) / 1e6)
         / (sqrt(CAST(q1sum AS DOUBLE) / 1e6)
            * sqrt(CAST(q2sum AS DOUBLE) / 1e6)) AS centroid_cos
FROM g
""",
)
def vector_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor — per-label centroid shift between
    two corpus snapshots (old = even vec_id, new = odd — in production
    the snapshot key is an ingest date), the check that catches a
    silently swapped/retrained embedding model or a distribution shift
    in the upstream corpus before it corrupts ANN indexes and dedup
    thresholds. Per-dimension component sums are exact bigint micros
    (the vector-family quantization discipline — float vector sums are
    partitioning-dependent, quantized sums are not); centroids derive
    per-dim by fixed IEEE division; the 64 per-dim drift/cos terms
    RE-QUANTIZE to bigints before the per-label sum, so both reported
    statistics value-hash cross-engine. Output per label: counts,
    squared L2 centroid drift, and centroid cosine (≈1 means direction
    preserved even if magnitude moved). Shape: one posexplode scan →
    map-side-combined (label, snap, dim) rollup (|labels|·2·64 rows);
    everything after is dimension-table sized. At 100 TB this runs per
    ingest batch against the running corpus centroids (mergeable: the
    component sums are associative)."""
    emb = t(spark, sf_dir, "embeddings")
    x = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("snap"),
        F.posexplode("embedding").alias("i", "xv"),
    ).select(
        "label",
        "snap",
        "i",
        F.round(F.col("xv") * F.lit(1e6), 0).cast("bigint").alias("xm"),
    )
    s = x.groupBy("label", "snap", "i").agg(
        F.sum("xm").cast("bigint").alias("sm"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    o = s.filter(F.col("snap") == 0).select(
        "label", "i", F.col("sm").alias("so"), F.col("n").alias("n_old")
    )
    nw = s.filter(F.col("snap") == 1).select(
        F.col("label").alias("_l"),
        F.col("i").alias("_i"),
        F.col("sm").alias("sn"),
        F.col("n").alias("n_new"),
    )
    co = (F.col("so").cast("double") / F.lit(1e6)) / F.col("n_old")
    cn = (F.col("sn").cast("double") / F.lit(1e6)) / F.col("n_new")
    qz = lambda e: F.round(e * F.lit(1e6), 0).cast("bigint")
    terms = (
        o.join(nw, (o.label == F.col("_l")) & (o.i == F.col("_i")))
        .select(
            "label",
            "n_old",
            "n_new",
            qz((co - cn) * (co - cn)).alias("d2"),
            qz(co * cn).alias("p"),
            qz(co * co).alias("q1"),
            qz(cn * cn).alias("q2"),
        )
    )
    g = terms.groupBy("label").agg(
        F.max("n_old").cast("bigint").alias("n_old"),
        F.max("n_new").cast("bigint").alias("n_new"),
        F.sum("d2").cast("bigint").alias("dsum"),
        F.sum("p").cast("bigint").alias("psum"),
        F.sum("q1").cast("bigint").alias("q1sum"),
        F.sum("q2").cast("bigint").alias("q2sum"),
    )
    return g.select(
        "label",
        "n_old",
        "n_new",
        (F.col("dsum").cast("double") / F.lit(1e6)).alias("drift_l2_sq"),
        (
            (F.col("psum").cast("double") / F.lit(1e6))
            / (
                F.sqrt(F.col("q1sum").cast("double") / F.lit(1e6))
                * F.sqrt(F.col("q2sum").cast("double") / F.lit(1e6))
            )
        ).alias("centroid_cos"),
    )


def _nn_descent_cte(
    k: int,
    bucket_size: int,
    iters: int,
    prune_shortlist: int | None = None,
    emb_where: str = "",
) -> str:
    """Unrolled NN-Descent as DuckDB CTEs; the final edge table is named
    e{iters}. Mirrors operators/similarity.py::nn_descent_graph stage
    for stage — adaptive B = ceil(n/bucket_size) (1-row scalar),
    seed = union of three hash-bucketings' top-k, then `iters` rounds
    of (reverse ∪ two-hop) candidate scoring. With `prune_shortlist`
    every candidate set first ranks by the exact int8 code dot
    (operators/similarity.py::_q8_prune) and only each src's shortlist
    reaches the cosine rerank — the same two-stage score the engine
    runs. Every CTE is MATERIALIZED: each round references the previous
    one several times, and inlining would re-expand the whole prefix
    exponentially (measured: the 4-round graph query runs in ~2 s
    materialized and did not finish in 10+ min inlined)."""
    from stream_processing_project_spark.operators.similarity import (
        NN_DESCENT_SEED_MULTIPLIERS,
    )

    seed_unions = "\n    UNION\n".join(
        f"""    SELECT a.id AS src, c.id AS dst
    FROM (SELECT id, ((id * {m}) % 4294967296 * b) >> 32
                 AS bkt FROM emb, nb) a
    JOIN (SELECT id, ((id * {m}) % 4294967296 * b) >> 32
                 AS bkt FROM emb, nb) c
    ON a.bkt = c.bkt AND a.id <> c.id"""
        for m in NN_DESCENT_SEED_MULTIPLIERS
    )

    def scored_topk(pairs: str, out: str) -> str:
        """Pair CTE → (optional int8-code shortlist →) cosine top-k."""
        if prune_shortlist is not None:
            short = f"""
s_{out} AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT pr.src, pr.dst,
           row_number() OVER (
             PARTITION BY pr.src
             ORDER BY CAST(list_dot_product(zs.q8::DOUBLE[], zd.q8::DOUBLE[])
                           AS BIGINT) DESC, pr.dst) AS rs
    FROM {pairs} pr
    JOIN z8 zs ON zs.id = pr.src
    JOIN z8 zd ON zd.id = pr.dst
  ) WHERE rs <= {prune_shortlist}
),"""
            pairs = f"s_{out}"
        else:
            short = ""
        return f"""{short}
{out} AS MATERIALIZED (
  SELECT src, dst, cos FROM (
    SELECT s.src, s.dst,
           round(list_cosine_similarity(ea.v, eb.v), 6) AS cos,
           row_number() OVER (
             PARTITION BY s.src
             ORDER BY round(list_cosine_similarity(ea.v, eb.v), 6) DESC, s.dst
           ) AS rn
    FROM {pairs} s
    JOIN emb ea ON ea.id = s.src
    JOIN emb eb ON eb.id = s.dst
  ) WHERE rn <= {k}
)"""

    q8_cte = (
        """,
z8 AS MATERIALIZED (
  SELECT id, list_transform(v, x -> least(greatest(
           CAST(round(x * 128, 0) AS BIGINT), -127), 127)) AS q8
  FROM emb
)"""
        if prune_shortlist is not None
        else ""
    )
    parts = [
        f"""
emb AS MATERIALIZED (SELECT vec_id AS id, embedding::DOUBLE[] AS v
                     FROM embeddings{emb_where}),
nb AS MATERIALIZED (
  SELECT greatest(1, (count(*) + {bucket_size - 1}) // {bucket_size}) AS b
  FROM emb
){q8_cte},
seedp AS MATERIALIZED (
{seed_unions}
),{scored_topk("seedp", "e0")}"""
    ]
    for i in range(iters):
        parts.append(
            f"""
u{i} AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e{i}
    UNION ALL
    SELECT dst AS src, src AS dst FROM (
      SELECT src, dst,
             row_number() OVER (
               PARTITION BY dst ORDER BY cos DESC, src) AS rr
      FROM e{i}) WHERE rr <= {2 * k})
),
c{i + 1} AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM u{i}
    UNION ALL
    SELECT x.src, y.dst FROM u{i} x JOIN u{i} y
    ON x.dst = y.src AND x.src <> y.dst)
),{scored_topk(f"c{i + 1}", f"e{i + 1}")}"""
        )
    return ",".join(parts)


# k=8 / 4 rounds: measured on the isotropic-random fixture (the
# hardest case for NN-Descent — no cluster structure to exploit),
# panel recall@8 climbs round over round to ~0.7+; k=4 converges to
# ~0.34 because the degree bounds the candidate pool (2k + 4k² per
# node). Real embedding corpora have manifold structure and converge
# faster (Dong et al. §5). Seed bucket size 64 (B = ⌈n/64⌉ adapts
# with the corpus, keeping the seed linear).
_NN_DESCENT_K, _NN_DESCENT_BSIZE, _NN_DESCENT_ITERS = 8, 64, 4
# int8-code prune shortlist (VERDICT r07 task 3): candidates rank by
# exact integer code dot first; only each node's 32 best touch full
# vectors. Fixture recall with the prune == without (0.79 at sf0.01);
# the 4-bit PQ/SDC variant the verdict named was measured first and
# collapsed recall to 0.42 (operators/similarity.py::_q8_codes).
_NN_DESCENT_SHORTLIST = 32

# One NN-Descent graph per (Spark app, corpus dir, index variant) —
# VERDICT r08 task 1a + r09 task 4. The registry consumers (graph,
# recall, beam search, outlier sweep — and, per variant, the insert
# pair, which indexes the corpus WITHOUT the arriving batch) need the
# SAME deterministic graph; before this cache each rebuilt it from
# scratch, so e.g. beam search's sf10 wall time was ≥75% graph build.
# A served system builds the index once and serves many consumers off
# it — the cache reproduces that: the first consumer materializes the
# edges (localCheckpoint), later ones read the checkpointed RDD. Keyed
# by applicationId so a restarted session (whose checkpointed RDDs are
# gone) rebuilds, with stale-app entries pruned; keyed by corpus path
# so tests on tmp fixtures don't collide; keyed by `variant` so a
# filtered index is one build per session, not one per consumer.
# Determinism is untouched: the cached frame is bit-identical to a
# fresh build, so driver/oracle results are unchanged no matter which
# consumer runs first.
#
# Bounded (ADVICE r09): a long-lived session touching many corpus dirs
# (pytest tmp fixtures) must not accumulate checkpointed RDD blocks for
# the app's lifetime — the cache keeps the _NN_GRAPH_CACHE_PER_APP most
# recent entries. Eviction is DETERMINISTIC (r11, VERDICT r10 task 4):
# the evicted frame's checkpointed RDD is unpersisted on the spot
# instead of lingering in the block manager until ContextCleaner GC —
# under pytest's many-tmp-corpus pattern GC-based reclaim is unbounded
# residency in practice. Stale-app entries are dropped by reference
# only (their context is gone; unpersist would throw).
_NN_GRAPH_CACHE: dict[tuple[str, str, str], DataFrame] = {}
_NN_GRAPH_CACHE_PER_APP = 4


def _nn_graph_shared(
    spark: SparkSession,
    sf_dir: str,
    variant: str = "full",
    source: DataFrame | None = None,
) -> DataFrame:
    """Session-shared NN-Descent index. `variant` names the node-set
    filter applied by `source` (the filtered frame to index); callers
    passing a filter MUST pass a variant string that uniquely describes
    it — the cache trusts the pair."""
    import os as _os

    app = spark.sparkContext.applicationId
    key = (app, _os.path.abspath(sf_dir), variant)
    g = _NN_GRAPH_CACHE.get(key)
    if g is None:
        for stale in [k2 for k2 in _NN_GRAPH_CACHE if k2[0] != app]:
            del _NN_GRAPH_CACHE[stale]
        same_app = [k2 for k2 in _NN_GRAPH_CACHE if k2[0] == app]
        while len(same_app) >= _NN_GRAPH_CACHE_PER_APP:
            evicted = _NN_GRAPH_CACHE.pop(same_app.pop(0))  # oldest first
            try:
                # free the localCheckpoint blocks NOW, not at the next
                # ContextCleaner GC. The persisted RDD is the INTERNAL
                # one captured by Dataset.checkpoint — `evicted.rdd`
                # is a derived wrapper whose unpersist is a no-op
                # (measured: getPersistentRDDs stays 1); the LogicalRDD
                # root of the analyzed plan holds the real handle.
                evicted._jdf.queryExecution().analyzed().rdd().unpersist(
                    False
                )
            except Exception:
                pass  # context torn down mid-teardown — nothing to free
        g = similarity.nn_descent_graph(
            source if source is not None else t(spark, sf_dir, "embeddings"),
            k=_NN_DESCENT_K,
            seed_bucket_size=_NN_DESCENT_BSIZE,
            iters=_NN_DESCENT_ITERS,
            pq_shortlist=_NN_DESCENT_SHORTLIST,
        ).localCheckpoint(eager=False)
        _NN_GRAPH_CACHE[key] = g
    return g


@register(
    "similarity_nn_descent_graph",
    oracle=f"""
WITH {_nn_descent_cte(_NN_DESCENT_K, _NN_DESCENT_BSIZE, _NN_DESCENT_ITERS, _NN_DESCENT_SHORTLIST)}
SELECT src AS vec_id, dst AS neighbor_id, cos, CAST(rn AS INTEGER) AS rank
FROM (
  SELECT src, dst, cos,
         row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
  FROM e{_NN_DESCENT_ITERS}
)
""",
)
def similarity_nn_descent_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-corpus k-NN graph by NN-Descent (Dong et al., WWW'11):
    deterministic hash-bucket seed graph, then _NN_DESCENT_ITERS (= 4)
    rounds of neighbor-of-neighbor candidate scoring at k =
    _NN_DESCENT_K (= 8). Every stage is an
    equi-join keyed by node id — candidate volume per node is bounded
    by the graph degree (2k + 4k²), never by corpus size, which is
    what makes this THE scale path for graph-ANN index builds where
    bucketed query-time ANN (similarity_ann_lsh/ivf) doesn't apply.
    Candidates are pruned to _NN_DESCENT_SHORTLIST (= 32) per node by
    exact int8 code dot before the cosine rerank, so the per-round
    shuffle ships 64 B codes instead of 512 B vectors (the r07
    adjudicated sf10 residual). Fully deterministic, so the
    approximate graph itself value-hash-oracles against the
    unrolled-CTE SQL replay
    (operators/similarity.py::nn_descent_graph). Shares the
    session-cached graph with recall/beam/outliers (_nn_graph_shared)."""
    return _nn_graph_shared(spark, sf_dir)


@register(
    "similarity_nn_descent_recall",
    oracle=f"""
WITH {_nn_descent_cte(_NN_DESCENT_K, _NN_DESCENT_BSIZE, _NN_DESCENT_ITERS, _NN_DESCENT_SHORTLIST)},
panel AS (SELECT id, v FROM emb WHERE id % 20 = 0 AND id < 10000),
exact AS (
  SELECT src, dst FROM (
    SELECT p.id AS src, c.id AS dst,
           row_number() OVER (
             PARTITION BY p.id
             ORDER BY round(list_cosine_similarity(p.v, c.v), 6) DESC, c.id
           ) AS rn
    FROM panel p JOIN emb c ON p.id <> c.id
  ) WHERE rn <= {_NN_DESCENT_K}
),
hits AS (
  SELECT count(*) AS n_hits FROM exact x
  JOIN e{_NN_DESCENT_ITERS} g ON g.src = x.src AND g.dst = x.dst
),
np AS (SELECT count(*) AS n_panel FROM panel)
SELECT CAST(n_panel AS BIGINT) AS n_panel,
       CAST(n_hits AS BIGINT) AS n_hits,
       n_hits / (n_panel * {_NN_DESCENT_K}.0) AS recall
FROM np, hits
""",
)
def similarity_nn_descent_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the NN-Descent graph against exact neighbors on a
    deterministic node panel (id % 20, capped at id < 10000 so the
    panel is a FIXED query set — an uncapped corpus-fraction panel
    would make the exact side quadratic at scale) — the measured-quality row
    for the graph build, same pattern as similarity_ann_recall_at_k.
    The exact side broadcasts only the panel against the corpus (the
    brute_force_topk shape: corpus never shuffles), so the audit stays
    runnable at any corpus size; the division is RAW (identical
    integer operands → identical IEEE double in any engine)."""
    graph = _nn_graph_shared(spark, sf_dir).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    emb = t(spark, sf_dir, "embeddings")
    panel = emb.filter((F.col("vec_id") % 20 == 0) & (F.col("vec_id") < 10000))
    exact = similarity.brute_force_topk(emb, panel, k=_NN_DESCENT_K).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    hits = exact.join(graph, ["src", "dst"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    np_ = panel.agg(F.count(F.lit(1)).alias("n_panel"))
    return np_.crossJoin(F.broadcast(hits)).select(
        F.col("n_panel").cast("bigint").alias("n_panel"),
        F.col("n_hits").cast("bigint").alias("n_hits"),
        (
            F.col("n_hits")
            / (F.col("n_panel") * F.lit(float(_NN_DESCENT_K)))
        ).alias("recall"),
    )


@register(
    "retrieval_eval_ndcg",
    oracle="""
WITH emb AS MATERIALIZED (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v, label FROM embeddings
),
panel AS (SELECT id, v, label FROM emb WHERE id % 20 = 0 AND id < 10000),
top10 AS (
  SELECT query_id, qlabel, nlabel, rank FROM (
    SELECT p.id AS query_id, p.label AS qlabel, c.label AS nlabel,
           row_number() OVER (
             PARTITION BY p.id
             ORDER BY round(list_cosine_similarity(p.v, c.v), 6) DESC, c.id
           ) AS rank
    FROM panel p JOIN emb c ON p.id <> c.id
  ) WHERE rank <= 10
),
scored AS (
  SELECT query_id, qlabel,
         CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END AS rel,
         CAST(round(1000000 / log2(rank + 1)) AS BIGINT) AS disc_micro,
         rank
  FROM top10
),
per_q AS (
  SELECT s.query_id, any_value(s.qlabel) AS label,
         CAST(sum(s.rel) AS BIGINT) AS n_rel,
         CAST(sum(s.rel * s.disc_micro) AS BIGINT) AS dcg_micro,
         CAST(min(CASE WHEN s.rel = 1 THEN s.rank END) AS BIGINT)
           AS first_rel_rank
  FROM scored s GROUP BY s.query_id
),
lab_cnt AS (SELECT label, count(*) AS n_lab FROM emb GROUP BY label),
cum_disc AS (
  SELECT r, CAST(sum(disc) OVER (ORDER BY r) AS BIGINT) AS idcg
  FROM (SELECT range AS r,
               CAST(round(1000000 / log2(range + 1)) AS BIGINT) AS disc
        FROM range(1, 11))
)
SELECT p.query_id, p.label, p.n_rel, p.dcg_micro,
       coalesce(c.idcg, 0) AS idcg_micro,
       CASE WHEN coalesce(c.idcg, 0) = 0 THEN 0.0
            ELSE p.dcg_micro / CAST(c.idcg AS DOUBLE) END AS ndcg,
       CAST(coalesce(CAST(round(1000000.0 / p.first_rel_rank) AS BIGINT), 0)
            AS BIGINT) AS mrr_micro
FROM per_q p
JOIN lab_cnt lc ON lc.label = p.label
LEFT JOIN cum_disc c ON c.r = least(10, lc.n_lab - 1)
""",
)
def retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation harness — per-query nDCG@10, MRR
    and relevant-hit counts for the exact cosine retriever against
    label-match relevance on a deterministic query panel (id % 20,
    capped at id < 10000: a FIXED query set, because a corpus-fraction
    panel would make the exact side quadratic at scale). This is the measurement rung
    of the retrieval family (bm25 / hybrid RRF / dense ANN): an engine
    that serves retrieval must also grade it, corpus-scale, without
    collecting per-query result lists to the driver.

    Determinism engineering: rank discounts 1/log2(r+1) quantize to
    integer micro-units per rank (identical integer operands → same
    double → same rounding in any engine), so DCG and ideal-DCG are
    INTEGER sums — order-independent; nDCG is one raw integer division.
    Ideal DCG is GLOBAL (ADVICE r07): the ideal list places min(10,
    corpus-wide relevant count) hits at the top ranks, so a query that
    retrieves one relevant doc at rank 1 out of hundreds available
    scores honestly low instead of a list-local 1.0 — computed from the
    per-label corpus counts (one tiny rollup, broadcast back) against a
    10-row cumulative-discount table; no second corpus pass. Scale
    shape: the panel broadcasts against the corpus (the brute_force_topk
    shape — the corpus never shuffles); everything after the top-10 cut
    is per-query windows over ≤10 rows."""
    emb = t(spark, sf_dir, "embeddings")
    panel = emb.filter((F.col("vec_id") % 20 == 0) & (F.col("vec_id") < 10000))
    top10 = similarity.brute_force_topk(emb, panel, k=10)
    qlab = panel.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    nlab = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel")
    )
    scored = (
        top10.join(F.broadcast(qlab), "query_id")
        .join(nlab, "neighbor_id")
        .select(
            "query_id",
            "qlabel",
            F.when(F.col("nlabel") == F.col("qlabel"), 1)
            .otherwise(0)
            .alias("rel"),
            F.round(F.lit(1000000) / F.log2(F.col("rank") + 1), 0)
            .cast("bigint")
            .alias("disc_micro"),
            "rank",
        )
    )
    per_q = scored.groupBy("query_id").agg(
        F.any_value(F.col("qlabel")).alias("label"),
        F.sum("rel").cast("bigint").alias("n_rel"),
        F.sum(F.col("rel") * F.col("disc_micro"))
        .cast("bigint")
        .alias("dcg_micro"),
        F.min(F.when(F.col("rel") == 1, F.col("rank")))
        .cast("bigint")
        .alias("first_rel_rank"),
    )
    # Global ideal: per-label corpus counts (tiny rollup, broadcast) ×
    # a 10-row cumulative rank-discount table — IDCG = cum(min(10, R))
    # where R = corpus relevant count excluding the query doc itself.
    lab_cnt = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_lab"))
    wcum = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
    cum_disc = (
        spark.range(1, 11)
        .select(
            F.col("id").alias("r"),
            F.round(F.lit(1000000) / F.log2(F.col("id") + 1), 0)
            .cast("bigint")
            .alias("disc"),
        )
        .select("r", F.sum("disc").over(wcum).cast("bigint").alias("idcg"))
    )
    return (
        per_q.join(F.broadcast(lab_cnt), "label")
        .withColumn("ideal_k", F.least(F.lit(10), F.col("n_lab") - 1))
        .join(
            F.broadcast(cum_disc),
            F.col("ideal_k") == F.col("r"),
            "left",
        )
        .select(
            "query_id",
            "label",
            "n_rel",
            "dcg_micro",
            F.coalesce(F.col("idcg"), F.lit(0)).cast("bigint").alias(
                "idcg_micro"
            ),
            F.when(F.coalesce(F.col("idcg"), F.lit(0)) == 0, F.lit(0.0))
            .otherwise(F.col("dcg_micro") / F.col("idcg").cast("double"))
            .alias("ndcg"),
            F.coalesce(
                F.round(F.lit(1000000.0) / F.col("first_rel_rank"), 0).cast(
                    "bigint"
                ),
                F.lit(0).cast("bigint"),
            ).alias("mrr_micro"),
        )
    )


@register(
    "retrieval_eval_paired_test",
    oracle=f"""
WITH emb AS MATERIALIZED (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v, label FROM embeddings
),
zc AS MATERIALIZED (
  SELECT vec_id AS id, {_Q8} AS q8, label FROM embeddings
),
panel AS (SELECT id, v, label FROM emb WHERE id % 20 = 0 AND id < 10000),
zq AS (SELECT id, q8, label FROM zc WHERE id % 20 = 0 AND id < 10000),
exact10 AS (
  SELECT query_id, qlabel, nlabel, rank FROM (
    SELECT p.id AS query_id, p.label AS qlabel, c.label AS nlabel,
           row_number() OVER (
             PARTITION BY p.id
             ORDER BY round(list_cosine_similarity(p.v, c.v), 6) DESC, c.id
           ) AS rank
    FROM panel p JOIN emb c ON p.id <> c.id
  ) WHERE rank <= 10
),
quant10 AS (
  SELECT query_id, qlabel, nlabel, rank FROM (
    SELECT p.id AS query_id, p.label AS qlabel, c.label AS nlabel,
           row_number() OVER (
             PARTITION BY p.id
             ORDER BY list_dot_product(p.q8::DOUBLE[], c.q8::DOUBLE[]) DESC,
                      c.id
           ) AS rank
    FROM zq p JOIN zc c ON p.id <> c.id
  ) WHERE rank <= 10
),
dcg_e AS (
  SELECT query_id, any_value(qlabel) AS label,
         CAST(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END
              * CAST(round(1000000 / log2(rank + 1)) AS BIGINT)) AS BIGINT)
           AS dcg_e_micro
  FROM exact10 GROUP BY query_id
),
dcg_q AS (
  SELECT query_id,
         CAST(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END
              * CAST(round(1000000 / log2(rank + 1)) AS BIGINT)) AS BIGINT)
           AS dcg_q_micro
  FROM quant10 GROUP BY query_id
),
lab_cnt AS (SELECT label, count(*) AS n_lab FROM emb GROUP BY label),
cum_disc AS (
  SELECT r, CAST(sum(disc) OVER (ORDER BY r) AS BIGINT) AS idcg
  FROM (SELECT range AS r,
               CAST(round(1000000 / log2(range + 1)) AS BIGINT) AS disc
        FROM range(1, 11))
),
per_q AS (
  SELECT e.query_id,
         CASE WHEN coalesce(c.idcg, 0) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(round(1000000.0 * e.dcg_e_micro
                             / CAST(c.idcg AS DOUBLE)) AS BIGINT) END AS nd_e,
         CASE WHEN coalesce(c.idcg, 0) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(round(1000000.0 * q.dcg_q_micro
                             / CAST(c.idcg AS DOUBLE)) AS BIGINT) END AS nd_q
  FROM dcg_e e
  JOIN dcg_q q ON q.query_id = e.query_id
  JOIN lab_cnt lc ON lc.label = e.label
  LEFT JOIN cum_disc c ON c.r = least(10, lc.n_lab - 1)
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_queries,
         CAST(sum(nd_e - nd_q) AS BIGINT) AS sum_delta_micro,
         CAST(sum((nd_e - nd_q) * (nd_e - nd_q)) AS BIGINT)
           AS sumsq_delta_micro,
         CAST(sum(nd_e) AS BIGINT) AS sum_ndcg_exact_micro,
         CAST(sum(nd_q) AS BIGINT) AS sum_ndcg_quant_micro
  FROM per_q
),
final AS (
  SELECT n_queries, sum_delta_micro, sumsq_delta_micro,
         sum_ndcg_exact_micro, sum_ndcg_quant_micro,
         CASE WHEN n_queries * sumsq_delta_micro
                   - sum_delta_micro * sum_delta_micro <= 0 THEN 0.0
              ELSE (CAST(sum_delta_micro AS DOUBLE)
                    * sqrt(CAST(n_queries - 1 AS DOUBLE)))
                   / sqrt(CAST(n_queries * sumsq_delta_micro
                               - sum_delta_micro * sum_delta_micro AS DOUBLE))
         END AS t_stat
  FROM agg
)
SELECT n_queries, sum_delta_micro, sumsq_delta_micro,
       sum_ndcg_exact_micro, sum_ndcg_quant_micro, t_stat,
       t_stat > 2.0 AS exact_sig_better
FROM final
""",
)
def retrieval_eval_paired_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired significance test over two rankers — the evaluation twin
    the retrieval stack lacked (VERDICT r10 task 5). Scores the
    exact-cosine and int8-quantized retrievers on the SAME fixed eval
    panel (the retrieval_eval_ndcg panel: id % 20, capped < 10000) with
    per-query nDCG@10 against label-match relevance and a GLOBAL ideal,
    then runs a paired t-test over the per-query deltas: the production
    question "does int8 quantization significantly hurt ranking
    quality?" answered with the stack's own rankers, corpus-scale.

    Determinism engineering: each per-query nDCG micro-quantizes to a
    bigint (one double division of exact integer operands, rounded to
    1e-6) BEFORE any summation, so Σd, Σd², Σndcg are order-free
    INTEGER aggregates; the t statistic is one fixed-shape double
    expression over them — t = Σd·√(n−1) / √(n·Σd² − (Σd)²) — identical
    operand sequence cross-engine (all operands exact below 2^53).
    Zero-variance corpora (the two rankers never disagree) yield t = 0,
    not NaN. `exact_sig_better` applies the conventional |t| > 2 rule.

    Scale shape: both rankers are the broadcast-panel-vs-corpus shape
    (the corpus never shuffles; the panel is FIXED, not a corpus
    fraction, so the exact side stays linear); everything after the
    top-10 cut is per-query aggregation over ≤10 rows and one global
    1-row reduce. No new shuffle beyond the per-query join of the two
    score tables (k·|panel| rows each)."""
    emb = t(spark, sf_dir, "embeddings")
    panel = emb.filter((F.col("vec_id") % 20 == 0) & (F.col("vec_id") < 10000))
    qlab = panel.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    nlab = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel")
    )

    def per_query_dcg(top10: DataFrame, out_col: str) -> DataFrame:
        scored = (
            top10.join(F.broadcast(qlab), "query_id")
            .join(nlab, "neighbor_id")
            .select(
                "query_id",
                "qlabel",
                F.when(F.col("nlabel") == F.col("qlabel"), 1)
                .otherwise(0)
                .alias("rel"),
                F.round(F.lit(1000000) / F.log2(F.col("rank") + 1), 0)
                .cast("bigint")
                .alias("disc_micro"),
            )
        )
        return scored.groupBy("query_id").agg(
            F.any_value(F.col("qlabel")).alias("label"),
            F.sum(F.col("rel") * F.col("disc_micro"))
            .cast("bigint")
            .alias(out_col),
        )

    dcg_e = per_query_dcg(
        similarity.brute_force_topk(emb, panel, k=10), "dcg_e_micro"
    )
    dcg_q = per_query_dcg(
        similarity.quantized_topk(emb, panel, k=10), "dcg_q_micro"
    ).drop("label")
    lab_cnt = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_lab"))
    wcum = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
    cum_disc = (
        spark.range(1, 11)
        .select(
            F.col("id").alias("r"),
            F.round(F.lit(1000000) / F.log2(F.col("id") + 1), 0)
            .cast("bigint")
            .alias("disc"),
        )
        .select("r", F.sum("disc").over(wcum).cast("bigint").alias("idcg"))
    )

    def nd(dcg_col: str):
        return (
            F.when(
                F.coalesce(F.col("idcg"), F.lit(0)) == 0,
                F.lit(0).cast("bigint"),
            )
            .otherwise(
                F.round(
                    F.lit(1000000.0)
                    * F.col(dcg_col)
                    / F.col("idcg").cast("double"),
                    0,
                ).cast("bigint")
            )
        )

    per_q = (
        dcg_e.join(dcg_q, "query_id")
        .join(F.broadcast(lab_cnt), "label")
        .withColumn("ideal_k", F.least(F.lit(10), F.col("n_lab") - 1))
        .join(F.broadcast(cum_disc), F.col("ideal_k") == F.col("r"), "left")
        .select(nd("dcg_e_micro").alias("nd_e"), nd("dcg_q_micro").alias("nd_q"))
    )
    agg = per_q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum(F.col("nd_e") - F.col("nd_q")).cast("bigint").alias(
            "sum_delta_micro"
        ),
        F.sum(
            (F.col("nd_e") - F.col("nd_q")) * (F.col("nd_e") - F.col("nd_q"))
        )
        .cast("bigint")
        .alias("sumsq_delta_micro"),
        F.sum("nd_e").cast("bigint").alias("sum_ndcg_exact_micro"),
        F.sum("nd_q").cast("bigint").alias("sum_ndcg_quant_micro"),
    )
    denom = (
        F.col("n_queries") * F.col("sumsq_delta_micro")
        - F.col("sum_delta_micro") * F.col("sum_delta_micro")
    )
    final = agg.withColumn(
        "t_stat",
        F.when(denom <= 0, F.lit(0.0)).otherwise(
            (
                F.col("sum_delta_micro").cast("double")
                * F.sqrt((F.col("n_queries") - 1).cast("double"))
            )
            / F.sqrt(denom.cast("double"))
        ),
    )
    return final.select(
        "n_queries",
        "sum_delta_micro",
        "sumsq_delta_micro",
        "sum_ndcg_exact_micro",
        "sum_ndcg_quant_micro",
        "t_stat",
        (F.col("t_stat") > 2.0).alias("exact_sig_better"),
    )


@register(
    "similarity_dbscan_clusters",
    oracle="""
WITH RECURSIVE pairs AS MATERIALIZED (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                     b.embedding::DOUBLE[]), 6) >= 0.35
),
nbrs AS MATERIALIZED (
  SELECT id_a AS v, id_b AS w FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
core AS MATERIALIZED (
  SELECT v FROM (SELECT v, count(*) AS deg FROM nbrs GROUP BY v)
  WHERE deg >= 3
),
ce AS MATERIALIZED (
  SELECT p.id_a AS u, p.id_b AS w FROM pairs p
  JOIN core ca ON ca.v = p.id_a JOIN core cb ON cb.v = p.id_b
),
ce2 AS MATERIALIZED (
  SELECT u, w FROM ce UNION SELECT w, u FROM ce
),
reach(node, lab) AS (
  SELECT u, u FROM ce2
  UNION
  SELECT e.w, r.lab FROM reach r JOIN ce2 e ON e.u = r.node
),
cc AS (SELECT node, min(lab) AS cluster FROM reach GROUP BY node),
core_lab AS MATERIALIZED (
  SELECT c.v AS vec_id, coalesce(cc.cluster, c.v) AS cluster
  FROM core c LEFT JOIN cc ON cc.node = c.v
),
border AS MATERIALIZED (
  SELECT n.v AS vec_id, min(cl.cluster) AS cluster
  FROM nbrs n JOIN core_lab cl ON cl.vec_id = n.w
  WHERE n.v NOT IN (SELECT vec_id FROM core_lab)
  GROUP BY n.v
)
SELECT vec_id, 'core' AS role, CAST(cluster AS BIGINT) AS cluster
FROM core_lab
UNION ALL
SELECT vec_id, 'border', CAST(cluster AS BIGINT) FROM border
UNION ALL
SELECT e.vec_id, 'noise', CAST(-1 AS BIGINT) FROM embeddings e
WHERE e.vec_id NOT IN (SELECT vec_id FROM core_lab)
  AND e.vec_id NOT IN (SELECT vec_id FROM border)
""",
)
def similarity_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN density clustering over the embedding corpus (Ester et
    al., KDD'96) — the density rung of the clustering family next to
    k-means (similarity_kmeans_train): finds arbitrarily-shaped
    clusters and an explicit noise set, with no k to choose. eps-
    neighborhood = cosine ≥ 0.35 (the dedup_embedding_cosine
    threshold); core = ≥ 3 eps-neighbors (minPts 4 counting self);
    clusters = connected components of the core-core graph (min-id
    labels — operators/dedup.py::connected_components, the oracled CC
    idiom); border points attach to the MINIMUM cluster label among
    their core neighbors (deterministic where classic DBSCAN is
    visit-order-dependent); everything else is labeled noise.

    Scale shape: the eps-neighbor pairs come from the SAME banded-LSH
    blocking as dedup_embedding_cosine (equi-join candidates, exact
    verify), degree and border assignment are map-side-combinable
    rollups, and the CC loop is the O(diameter) label propagation with
    per-round localCheckpoint. DBSCAN output is miss-SENSITIVE: one
    dropped eps-pair can cascade through core degree → components →
    border labels, so this query runs the blocking at miss_prob=1e-8
    per pair (vs the 1e-5 default — ~17 extra bands at t=0.35, linear
    cost) and the exact-recall pin covers BOTH fixture scales
    (tests/test_dedup_similarity.py sf0.01 + the sf0.1 DBSCAN-config
    pin in test_r08_props.py). ORACLE CONTRACT: the all-pairs DuckDB
    replay is exact, so hash-equality holds wherever blocking recall
    is exact — pinned at fixture scales; at larger corpora the LSH
    union-miss bound (≈ qualifying_pairs × 1e-8) is the stated
    contract, not bitwise equality. Output: (vec_id, role
    core/border/noise, cluster = min core id, -1 for noise) — fully
    value-hash-oracled against the all-pairs + recursive-closure SQL
    replay."""
    emb = t(spark, sf_dir, "embeddings")
    # The eps-pair set is tiny (qualifying tail pairs) but its lineage —
    # banded LSH at t=0.35 with 124 bands — is the expensive stage, and
    # it fans out to nbrs (×2), core, ce and border below. Eager
    # localCheckpoint truncates the lineage so the LSH scan runs ONCE
    # (measured sf0.1: 59 s → one ~16 s pass + cheap rollups).
    pairs = (
        similarity.embedding_near_dup_pairs(
            emb, threshold=0.35, miss_prob=1e-8
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    nbrs = pairs.union(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).toDF("v", "w")
    core = (
        nbrs.groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") >= 3)
        .select("v")
    )
    ce = pairs.join(
        core.withColumnRenamed("v", "id_a"), "id_a"
    ).join(core.withColumnRenamed("v", "id_b"), "id_b")
    cc = dedup.connected_components(ce, src="id_a", dst="id_b")
    core_lab = core.join(
        cc, core["v"] == cc["doc_id"], "left"
    ).select(
        F.col("v").alias("vec_id"),
        F.coalesce(F.col("cluster_id"), F.col("v")).alias("cluster"),
    )
    border = (
        nbrs.join(
            core_lab.select(
                F.col("vec_id").alias("w"), F.col("cluster").alias("ncl")
            ),
            "w",
        )
        .join(
            core_lab.select(F.col("vec_id").alias("v")),
            "v",
            "left_anti",
        )
        .groupBy("v")
        .agg(F.min("ncl").alias("cluster"))
        .select(F.col("v").alias("vec_id"), "cluster")
    )
    assigned = core_lab.select(
        "vec_id", F.lit("core").alias("role"), F.col("cluster").cast("bigint")
    ).union(
        border.select(
            "vec_id", F.lit("border").alias("role"), F.col("cluster").cast("bigint")
        )
    )
    noise = (
        emb.select("vec_id")
        .join(assigned.select("vec_id"), "vec_id", "left_anti")
        .select(
            "vec_id",
            F.lit("noise").alias("role"),
            F.lit(-1).cast("bigint").alias("cluster"),
        )
    )
    return assigned.union(noise)


# --- r08 additions: MMR diverse re-ranking + graph-ANN beam search ------------

_MMR_POOL, _MMR_K, _MMR_LAM, _MMR_COMP = 48, 10, 7, 3  # λ = 0.7, scaled ×10


def _mmr_oracle(pool: int, k: int, lam: int, comp: int, dim: int) -> str:
    """Unrolled greedy MMR as DuckDB CTEs — the k-center oracle idiom:
    one (pick, survivors-update) pair per round, all scores exact
    bigint dots of the 2^20-quantized vectors."""
    scale = 1 << 20
    dot = (
        "CAST(list_sum(list_transform(range(1, {d1}), "
        "i -> d.qv[i] * {other}.qv[i])) AS BIGINT)"
    )
    parts = [
        f"""
q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {scale}.0) AS BIGINT)) AS qv
  FROM embeddings
),
qid AS (SELECT min(vec_id) AS qid FROM q),
qr AS MATERIALIZED (SELECT qv FROM q ORDER BY vec_id LIMIT 1),
s0 AS MATERIALIZED (
  SELECT d.vec_id, d.qv,
         {dot.format(d1=dim + 1, other="r")} AS rel,
         CAST(0 AS BIGINT) AS ms
  FROM q d, qr r, qid WHERE d.vec_id <> qid.qid
  ORDER BY rel DESC, d.vec_id LIMIT {pool}
)"""
    ]
    for r in range(1, k + 1):
        parts.append(
            f"""
p{r} AS MATERIALIZED (
  SELECT vec_id, qv, rel, ms FROM s{r - 1}
  ORDER BY {lam} * rel - {comp} * ms DESC, vec_id LIMIT 1
),
s{r} AS MATERIALIZED (
  SELECT d.vec_id, d.qv, d.rel,
         greatest(d.ms, {dot.format(d1=dim + 1, other="p")}) AS ms
  FROM s{r - 1} d, p{r} p WHERE d.vec_id <> p.vec_id
)"""
        )
    picks = "\nUNION ALL ".join(
        f"SELECT {r} AS pick, vec_id, rel AS rel_dot, ms AS max_sim_dot,"
        f" {lam} * rel - {comp} * ms AS mmr_score FROM p{r}"
        for r in range(1, k + 1)
    )
    return "WITH " + ",".join(parts) + "\n" + picks


@register(
    "similarity_mmr_select",
    oracle=_mmr_oracle(_MMR_POOL, _MMR_K, _MMR_LAM, _MMR_COMP, 64),
)
def similarity_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98) — diverse top-k selection for a query: greedily pick
    argmax λ·rel(d) − (1−λ)·max_{s∈picked} sim(d, s), the standard
    redundancy-killer for retrieval-augmented data curation (the
    RELEVANCE-diversity complement of sampling_kcenter_diversity's
    pure-coverage objective). Query = the min-vec_id embedding; stage
    1 is ONE corpus pass (exact integer dot vs the broadcast query,
    TakeOrderedAndProject top-48 pool); stage 2 runs k=10 greedy
    rounds on the fixed-size pool — per-round state is one collected
    row (the k-center/MLlib iterative idiom), so corpus size only
    ever touches stage 1. λ = 0.7 enters as exact integers (7·rel −
    3·maxsim, both ×10): every score is a bigint, ties break by
    vec_id, and the whole greedy trajectory value-hash-oracles
    against the unrolled SQL replay."""
    from stream_processing_project_spark.operators.similarity import (
        _quantize_expr,
    )

    dim, pool_n, k = 64, _MMR_POOL, _MMR_K
    q = t(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", f"{_quantize_expr('embedding', dim)} AS qv"
    )
    out_schema = (
        "pick int, vec_id bigint, rel_dot bigint, max_sim_dot bigint,"
        " mmr_score bigint"
    )
    qrow = q.orderBy("vec_id").limit(1).collect()
    if not qrow:
        return spark.createDataFrame([], out_schema)
    qid, qv = qrow[0]["vec_id"], qrow[0]["qv"]

    def dot_to(vec: list[int]):
        arr = F.array(*[F.lit(int(x)).cast("long") for x in vec])
        return F.aggregate(
            F.zip_with(F.col("qv"), arr, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    pool = (
        q.filter(F.col("vec_id") != qid)
        .select("vec_id", "qv", dot_to(qv).alias("rel"))
        .withColumn("ms", F.lit(0).cast("long"))
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(pool_n)
        .localCheckpoint(eager=False)
    )
    score = F.lit(_MMR_LAM) * F.col("rel") - F.lit(_MMR_COMP) * F.col("ms")
    picks = []
    for r in range(1, k + 1):
        top = pool.orderBy(score.desc(), "vec_id").limit(1).collect()
        if not top:
            break
        p = top[0]
        picks.append(
            (
                r,
                p["vec_id"],
                int(p["rel"]),
                int(p["ms"]),
                _MMR_LAM * int(p["rel"]) - _MMR_COMP * int(p["ms"]),
            )
        )
        pool = (
            pool.filter(F.col("vec_id") != p["vec_id"])
            .select(
                "vec_id",
                "qv",
                "rel",
                F.greatest(F.col("ms"), dot_to(p["qv"])).alias("ms"),
            )
            .localCheckpoint(eager=False)
        )
    return spark.createDataFrame(picks, out_schema)


_BEAM_W, _BEAM_ROUNDS, _BEAM_K = 8, 5, 5


def _beam_search_cte(beam: int, rounds: int, k: int) -> str:
    """Beam-search routing over the NN-Descent graph as unrolled CTEs,
    appended after the graph CTE prefix (final edge table e{iters})."""
    g = f"e{_NN_DESCENT_ITERS}"
    parts = [
        f"""
panel AS MATERIALIZED (SELECT id, v FROM emb WHERE id % 20 = 0 AND id < 10000),
entry AS (SELECT min(id) AS eid FROM emb),
bm0 AS MATERIALIZED (SELECT p.id AS query_id, e.eid AS node FROM panel p, entry e)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""
bc{i} AS MATERIALIZED (
  SELECT DISTINCT query_id, node FROM (
    SELECT query_id, node FROM bm{i - 1}
    UNION ALL
    SELECT b.query_id, g.dst AS node FROM bm{i - 1} b JOIN {g} g ON g.src = b.node)
),
bsc{i} AS MATERIALIZED (
  SELECT c.query_id, c.node,
         round(list_cosine_similarity(p.v, ev.v), 6) AS cos
  FROM bc{i} c JOIN panel p ON p.id = c.query_id JOIN emb ev ON ev.id = c.node
),
bm{i} AS MATERIALIZED (
  SELECT query_id, node FROM (
    SELECT query_id, node,
           row_number() OVER (
             PARTITION BY query_id ORDER BY cos DESC, node) AS rn
    FROM bsc{i}
  ) WHERE rn <= {beam}
)"""
        )
    final = f"""
SELECT query_id, node AS neighbor_id, cos, CAST(rn2 AS INTEGER) AS rank FROM (
  SELECT query_id, node, cos,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cos DESC, node) AS rn2
  FROM bsc{rounds} WHERE node <> query_id
) WHERE rn2 <= {k}"""
    return ",".join(parts) + final


@register(
    "similarity_graph_beam_search",
    oracle=f"""
WITH {_nn_descent_cte(_NN_DESCENT_K, _NN_DESCENT_BSIZE, _NN_DESCENT_ITERS, _NN_DESCENT_SHORTLIST)},
{_beam_search_cte(_BEAM_W, _BEAM_ROUNDS, _BEAM_K)}
""",
)
def similarity_graph_beam_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-ANN SERVING over the NN-Descent index — beam-search query
    routing (the HNSW/DiskANN query side, deterministic): from a fixed
    entry node, each of _BEAM_ROUNDS (= 5) rounds expands the current
    beam through the k-NN graph's edges (ONE equi-join on node id —
    candidates per query ≤ beam·(k+1), never corpus-sized), scores
    candidates by exact cosine against the query, and keeps the
    _BEAM_W (= 8) best; the final beam emits top-_BEAM_K neighbors per
    panel query. Completes the graph family: nn_descent_graph BUILDS
    the index, this op answers queries through it — at 100 TB the
    graph is the only corpus-sized table touched, queries ride
    broadcasts, and hop count (not corpus size) bounds latency. Panel
    = the established fixed ≤10k-id query set. Every stage reuses the
    graph oracle's determinism (rounded cosine, id tie-breaks), so the
    routed results value-hash-oracle end to end."""
    emb_raw = t(spark, sf_dir, "embeddings")
    g = _nn_graph_shared(spark, sf_dir).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    emb = emb_raw.selectExpr(
        "vec_id AS id", "CAST(embedding AS array<double>) AS v"
    )
    panel = emb.filter((F.col("id") % 20 == 0) & (F.col("id") < 10000)).select(
        F.col("id").alias("query_id"), F.col("v").alias("pv")
    )
    entry = emb.agg(F.min("id").alias("node"))
    beam = panel.select("query_id").crossJoin(F.broadcast(entry))
    node_v = emb.select(F.col("id").alias("node"), F.col("v").alias("nv"))
    from stream_processing_project_spark.operators.similarity import cosine

    scored = None
    for _ in range(_BEAM_ROUNDS):
        nbrs = beam.join(g, beam["node"] == g["src"]).select(
            "query_id", F.col("dst").alias("node")
        )
        cand = beam.union(nbrs).distinct()
        scored = (
            cand.join(node_v, "node")
            .join(F.broadcast(panel), "query_id")
            .select(
                "query_id",
                "node",
                F.round(cosine(F.col("pv"), F.col("nv")), 6).alias("cos"),
            )
            .localCheckpoint(eager=False)
        )
        wb = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("node")
        )
        beam = (
            scored.withColumn("_rn", F.row_number().over(wb))
            .filter(F.col("_rn") <= _BEAM_W)
            .select("query_id", "node")
        )
    wf = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("node"))
    return (
        scored.filter(F.col("node") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(wf).cast("int"))
        .filter(F.col("rank") <= _BEAM_K)
        .select("query_id", F.col("node").alias("neighbor_id"), "cos", "rank")
    )


@register(
    "similarity_knn_outliers",
    oracle=f"""
WITH {_nn_descent_cte(_NN_DESCENT_K, _NN_DESCENT_BSIZE, _NN_DESCENT_ITERS, _NN_DESCENT_SHORTLIST)},
deg AS (
  SELECT src AS vec_id,
         CAST(sum(CAST(round(cos * 1000000) AS BIGINT)) AS BIGINT)
           AS sum_cos_micro,
         CAST(min(CAST(round(cos * 1000000) AS BIGINT)) AS BIGINT)
           AS min_cos_micro
  FROM e{_NN_DESCENT_ITERS} GROUP BY 1
)
SELECT vec_id, sum_cos_micro, min_cos_micro, CAST(rn AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (ORDER BY sum_cos_micro, vec_id) AS rn
  FROM deg
) WHERE rn <= 20
""",
)
def similarity_knn_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space OUTLIER detection off the k-NN graph — the
    data-cleaning read of the index this family already builds: a
    node whose k best neighbors are all far away is isolated (noise,
    OCR garbage, wrong-modality rows — the stuff curation pipelines
    drop first). Score = Σ cos over the node's k graph edges in exact
    integer micro-units (order-independent under any partitioning);
    emit the 20 most isolated nodes with their weakest-edge cosine.
    Zero extra corpus passes beyond the graph build — the aggregation
    reads k·n edge rows, and at serving time the graph is already
    materialized, so outlier sweeps are free riders on the ANN index
    (the production pattern: one index, many consumers)."""
    g = _nn_graph_shared(spark, sf_dir)
    micro = F.round(F.col("cos") * F.lit(1000000)).cast("long")
    deg = (
        g.select("vec_id", micro.alias("cm"))
        .groupBy("vec_id")
        .agg(
            F.sum("cm").cast("long").alias("sum_cos_micro"),
            F.min("cm").cast("long").alias("min_cos_micro"),
        )
    )
    w = Window.orderBy(F.col("sum_cos_micro").asc(), F.col("vec_id").asc())
    return (
        deg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 20)
        .select("vec_id", "sum_cos_micro", "min_cos_micro", "rank")
    )


@register(
    "sampling_prototypicality",
    oracle=f"""
WITH {_kmeans_rounds_cte(8, 3, 64)},
assigned AS (
  SELECT vec_id, best[2] AS cluster_id, best[1] AS dist_sq
  FROM a4
),
ranked AS (
  SELECT vec_id, cluster_id, CAST(dist_sq AS BIGINT) AS dist_sq,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY dist_sq, vec_id) AS pr,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY dist_sq DESC, vec_id DESC) AS xr
  FROM assigned
)
SELECT vec_id, cluster_id, dist_sq, 'prototype' AS role,
       CAST(pr AS INTEGER) AS rank
FROM ranked WHERE pr <= 5
UNION ALL
SELECT vec_id, cluster_id, dist_sq, 'hard' AS role,
       CAST(xr AS INTEGER) AS rank
FROM ranked WHERE xr <= 5
""",
)
def sampling_prototypicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototypicality-based data pruning (Sorscher et al., NeurIPS'22
    "Beyond neural scaling laws"): rank every vector by its exact
    integer squared distance to its trained k-means centroid — the
    per-cluster PROTOTYPES (smallest distance) are what you keep when
    data is scarce, the HARD examples (largest) when data is abundant;
    emit both ends, 5 per cluster per role. Composes the already-
    oracled Lloyd trainer (similarity_kmeans_train's rounds, bit-exact
    in SQL): ONE extra corpus pass computes assignments, then two
    per-cluster WindowGroupLimits cut the heads — no collect beyond
    kmeans_fit's k·dim centroid rows, no all-pairs anything. Ties
    break by vec_id on the prototype end and by vec_id DESC on the
    hard end so the two roles stay disjoint even inside tied bands."""
    from stream_processing_project_spark.operators.similarity import (
        _centroid_assignment,
        kmeans_fit,
    )

    spark_q, centroids = kmeans_fit(t(spark, sf_dir, "embeddings"))
    dist_c, cid_c = _centroid_assignment(centroids)
    assigned = spark_q.select(
        "vec_id",
        cid_c.alias("cluster_id"),
        dist_c.cast("long").alias("dist_sq"),
    )
    wp = Window.partitionBy("cluster_id").orderBy(
        F.col("dist_sq").asc(), F.col("vec_id").asc()
    )
    wx = Window.partitionBy("cluster_id").orderBy(
        F.col("dist_sq").desc(), F.col("vec_id").desc()
    )
    ranked = assigned.withColumn("pr", F.row_number().over(wp)).withColumn(
        "xr", F.row_number().over(wx)
    )
    proto = ranked.filter(F.col("pr") <= 5).select(
        "vec_id",
        "cluster_id",
        "dist_sq",
        F.lit("prototype").alias("role"),
        F.col("pr").cast("int").alias("rank"),
    )
    hard = ranked.filter(F.col("xr") <= 5).select(
        "vec_id",
        "cluster_id",
        "dist_sq",
        F.lit("hard").alias("role"),
        F.col("xr").cast("int").alias("rank"),
    )
    return proto.union(hard)


# --- incremental graph insert: the index-maintenance stage ------------------
_INSERT_MOD = 20  # batch = vec_id % 20 == 7 (and < 10000): a bounded increment
# Insert routes with a WIDER beam than serving (32 vs 8): inserted
# edges are permanent index state with an offline latency budget, and
# width is the measured quality lever while extra rounds saturate —
# swept at sf0.01: W=8 → recall 0.46, W=16 → 0.61, W=32 → 0.81
# (ABOVE the full build's 0.79) at identical wall time (candidates
# per query ≤ W·(k+1) = 288, still hop-bounded, never corpus-sized).
_INSERT_BEAM_W = 32


def _graph_insert_cte(
    beam: int, rounds: int, k: int, final_as: str | None = None
) -> str:
    """Batch-insert routing as unrolled CTEs, appended after a graph CTE
    prefix built on the FILTERED index corpus (emb excludes the batch);
    query vectors come from the separate `batch` CTE. With `final_as`
    the trailing SELECT is wrapped as one more named CTE so composing
    oracles (the insert-recall audit) can keep querying."""
    g = f"e{_NN_DESCENT_ITERS}"
    parts = [
        f"""
batch AS MATERIALIZED (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE vec_id % {_INSERT_MOD} = 7 AND vec_id < 10000),
entry AS (SELECT min(id) AS eid FROM emb),
bm0 AS MATERIALIZED (SELECT b.id AS query_id, e.eid AS node FROM batch b, entry e)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""
bc{i} AS MATERIALIZED (
  SELECT DISTINCT query_id, node FROM (
    SELECT query_id, node FROM bm{i - 1}
    UNION ALL
    SELECT b.query_id, g.dst AS node FROM bm{i - 1} b JOIN {g} g ON g.src = b.node)
),
bsc{i} AS MATERIALIZED (
  SELECT c.query_id, c.node,
         round(list_cosine_similarity(p.v, ev.v), 6) AS cos
  FROM bc{i} c JOIN batch p ON p.id = c.query_id JOIN emb ev ON ev.id = c.node
),
bm{i} AS MATERIALIZED (
  SELECT query_id, node FROM (
    SELECT query_id, node,
           row_number() OVER (
             PARTITION BY query_id ORDER BY cos DESC, node) AS rn
    FROM bsc{i}
  ) WHERE rn <= {beam}
)"""
        )
    final = f"""
SELECT query_id AS vec_id, node AS neighbor_id, cos,
       CAST(rn2 AS INTEGER) AS rank FROM (
  SELECT query_id, node, cos,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cos DESC, node) AS rn2
  FROM bsc{rounds}
) WHERE rn2 <= {k}"""
    if final_as is not None:
        return ",".join(parts) + f",\n{final_as} AS MATERIALIZED ({final}\n)"
    return ",".join(parts) + final


@register(
    "similarity_graph_insert_batch",
    oracle=f"""
WITH {_nn_descent_cte(_NN_DESCENT_K, _NN_DESCENT_BSIZE, _NN_DESCENT_ITERS, _NN_DESCENT_SHORTLIST, emb_where=f" WHERE vec_id % {_INSERT_MOD} <> 7")},
{_graph_insert_cte(_INSERT_BEAM_W, _BEAM_ROUNDS, _NN_DESCENT_K)}
""",
)
def similarity_graph_insert_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance — the graph-ANN lifecycle stage
    between build and serving (VERDICT r08 'grow the surface'): a
    BATCH of new vectors (vec_id % 20 == 7, capped < 10000 — a bounded
    increment, the arrival shape of a crawl shard) is inserted into
    the existing NN-Descent index (built on the corpus WITHOUT them)
    by the HNSW/DiskANN insert recipe: route each new vector through
    the graph by beam search from the fixed entry node (_INSERT_BEAM_W
    = 32 — wider than serving's 8 because inserted edges are permanent
    and width is the measured quality lever: recall 0.46 → 0.81,
    _BEAM_ROUNDS = 5), then take its k best routed candidates as its
    edge list. Per new node the work is beam·(k+1) candidate rows per
    round — bounded by graph degree and hop count, NEVER by corpus or
    index size, which is why serving systems insert this way instead
    of rebuilding (an O(batch) increment vs the O(n) build;
    cross-corpus analogue of dedup_incremental's blocked increment).
    Emits (vec_id, neighbor_id, cos, rank) — the new nodes' adjacency,
    union-able with the existing edge table. Determinism: rounded
    cosine + id tie-breaks all the way down (the graph family idiom),
    so the whole routed insert value-hash-oracles against the unrolled
    CTE replay."""
    from stream_processing_project_spark.operators.similarity import cosine

    emb_all = t(spark, sf_dir, "embeddings")
    index_emb = emb_all.filter(F.col("vec_id") % _INSERT_MOD != 7)
    batch = emb_all.filter(
        (F.col("vec_id") % _INSERT_MOD == 7) & (F.col("vec_id") < 10000)
    ).selectExpr("vec_id AS query_id", "CAST(embedding AS array<double>) AS pv")
    # r10 (VERDICT r09 task 4): the filtered index (corpus minus the
    # arriving batch) rides the session cache under its own variant key
    # — insert_batch and insert_recall share ONE build per session
    # instead of each paying it, so the pair measures ROUTING after the
    # first toucher (the build-once-serve-many shape the full graph's
    # consumers already have).
    g = _nn_graph_shared(
        spark, sf_dir, variant=f"ins_mod{_INSERT_MOD}ne7", source=index_emb
    ).select(F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst"))
    emb = index_emb.selectExpr(
        "vec_id AS id", "CAST(embedding AS array<double>) AS v"
    )
    node_v = emb.select(F.col("id").alias("node"), F.col("v").alias("nv"))
    entry = emb.agg(F.min("id").alias("node"))
    beam = batch.select("query_id").crossJoin(F.broadcast(entry))
    scored = None
    for _ in range(_BEAM_ROUNDS):
        nbrs = beam.join(g, beam["node"] == g["src"]).select(
            "query_id", F.col("dst").alias("node")
        )
        cand = beam.union(nbrs).distinct()
        scored = (
            cand.join(node_v, "node")
            .join(F.broadcast(batch), "query_id")
            .select(
                "query_id",
                "node",
                F.round(cosine(F.col("pv"), F.col("nv")), 6).alias("cos"),
            )
            .localCheckpoint(eager=False)
        )
        wb = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("node")
        )
        beam = (
            scored.withColumn("_rn", F.row_number().over(wb))
            .filter(F.col("_rn") <= _INSERT_BEAM_W)
            .select("query_id", "node")
        )
    if scored is None:
        return spark.createDataFrame(
            [], "vec_id bigint, neighbor_id bigint, cos double, rank int"
        )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("node")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wf).cast("int"))
        .filter(F.col("rank") <= _NN_DESCENT_K)
        .select(
            F.col("query_id").alias("vec_id"),
            F.col("node").alias("neighbor_id"),
            "cos",
            "rank",
        )
    )


_DELETE_MOD = 20  # tombstones = vec_id % 20 == 3 (~5% of the index)


@register(
    "similarity_graph_delete_compact",
    oracle=f"""
WITH {_nn_descent_cte(_NN_DESCENT_K, _NN_DESCENT_BSIZE, _NN_DESCENT_ITERS, _NN_DESCENT_SHORTLIST)},
keep AS MATERIALIZED (
  SELECT src, dst FROM e{_NN_DESCENT_ITERS}
  WHERE src % {_DELETE_MOD} <> 3 AND dst % {_DELETE_MOD} <> 3
),
broken AS MATERIALIZED (
  SELECT src, dst FROM e{_NN_DESCENT_ITERS}
  WHERE src % {_DELETE_MOD} <> 3 AND dst % {_DELETE_MOD} = 3
),
inherited AS (
  SELECT b.src, g.dst FROM broken b
  JOIN e{_NN_DESCENT_ITERS} g ON g.src = b.dst
  WHERE g.dst % {_DELETE_MOD} <> 3 AND g.dst <> b.src
),
cand AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM keep UNION ALL SELECT src, dst FROM inherited)
)
SELECT src AS vec_id, dst AS neighbor_id, cos, CAST(rn AS INTEGER) AS rank
FROM (
  SELECT c.src, c.dst,
         round(list_cosine_similarity(ea.v, eb.v), 6) AS cos,
         row_number() OVER (
           PARTITION BY c.src
           ORDER BY round(list_cosine_similarity(ea.v, eb.v), 6) DESC, c.dst
         ) AS rn
  FROM cand c JOIN emb ea ON ea.id = c.src JOIN emb eb ON eb.id = c.dst
) WHERE rn <= {_NN_DESCENT_K}
""",
)
def similarity_graph_delete_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone deletion + edge healing — the remaining graph-ANN
    lifecycle stage (build → serve → insert → DELETE): ~5% of index
    nodes (vec_id % 20 == 3) are tombstoned; their adjacency lists are
    dropped, and every survivor that pointed at a tombstone INHERITS
    the tombstone's own out-neighbors as replacement candidates (the
    DiskANN/FreshDiskANN delete recipe — routing through a removed
    node is preserved by short-circuiting its edges), then each healed
    node keeps its k best by exact cosine (ties by id). Fifth consumer
    of the session-shared graph (_nn_graph_shared): the sweep costs
    O(k·n) edge rows + candidate rescoring bounded by k + k² per
    healed node — zero extra corpus passes, no rebuild. Deterministic
    end to end, so the compacted adjacency value-hash-oracles against
    the CTE replay."""
    from stream_processing_project_spark.operators.similarity import cosine

    g = _nn_graph_shared(spark, sf_dir).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    live_src = F.col("src") % _DELETE_MOD != 3
    dead_dst = F.col("dst") % _DELETE_MOD == 3
    keep = g.filter(live_src & ~dead_dst)
    broken = g.filter(live_src & dead_dst)
    g2 = g.select(F.col("src").alias("t_src"), F.col("dst").alias("t_dst"))
    inherited = (
        broken.join(g2, broken["dst"] == g2["t_src"])
        .filter((F.col("t_dst") % _DELETE_MOD != 3) & (F.col("t_dst") != F.col("src")))
        .select("src", F.col("t_dst").alias("dst"))
    )
    cand = keep.union(inherited).distinct()
    emb = t(spark, sf_dir, "embeddings").selectExpr(
        "vec_id AS id", "CAST(embedding AS array<double>) AS v"
    )
    sv = emb.select(F.col("id").alias("src"), F.col("v").alias("sv"))
    dv = emb.select(F.col("id").alias("dst"), F.col("v").alias("dv"))
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst"))
    return (
        cand.join(sv, "src")
        .join(dv, "dst")
        .select(
            "src", "dst", F.round(cosine(F.col("sv"), F.col("dv")), 6).alias("cos")
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _NN_DESCENT_K)
        .select(
            F.col("src").alias("vec_id"),
            F.col("dst").alias("neighbor_id"),
            "cos",
            "rank",
        )
    )


@register(
    "vector_abtt_postprocess",
    oracle=f"""
WITH {_pca_cte_prefix(64, 200)},
sxl AS (SELECT list(sx ORDER BY j) AS s FROM sx),
ul AS (SELECT list(v ORDER BY k) AS u FROM v200),
uuv AS (SELECT CAST(list_sum(list_transform(u, x -> x * x)) AS BIGINT) AS uu
        FROM ul),
corr AS MATERIALIZED (
  SELECT q.vec_id,
         list_transform(range(1, 65), d -> nn.n * q.qq[d] - sxl.s[d]) AS c
  FROM q, nn, sxl
),
dotc AS MATERIALIZED (
  SELECT c.vec_id,
         CAST(list_sum(list_transform(range(1, 65),
                                      d -> c.c[d] * ul.u[d])) AS BIGINT)
           AS udotc
  FROM corr c, ul
),
proj AS MATERIALIZED (
  SELECT c.vec_id,
         list_transform(range(1, 65),
           d -> CAST(c.c[d] AS DOUBLE)
                - CAST(ul.u[d] AS DOUBLE)
                  * (CAST(dc.udotc AS DOUBLE) / CAST(uuv.uu AS DOUBLE))) AS vp
  FROM corr c JOIN dotc dc USING (vec_id), ul, uuv
),
pnl AS (SELECT vec_id, vp FROM proj WHERE vec_id % 50 = 0 AND vec_id < 5000)
SELECT query_id, neighbor_id, cos_abtt, CAST(rn AS INTEGER) AS rank FROM (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(p.vp, c.vp), 6) AS cos_abtt,
         row_number() OVER (
           PARTITION BY p.vec_id
           ORDER BY round(list_cosine_similarity(p.vp, c.vp), 6)
                    DESC NULLS LAST, c.vec_id) AS rn
  FROM pnl p JOIN proj c ON c.vec_id <> p.vec_id
) WHERE rn <= 3
""",
)
def vector_abtt_postprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-but-the-Top embedding post-processing (Mu & Viswanath,
    ICLR'18) — the standard anisotropy correction retrieval stacks run
    before indexing: subtract the corpus mean and the projection onto
    the dominant principal component (the direction
    vector_pca_power_iteration extracts), because a collapsing
    embedding space lets one hub direction dominate every cosine.
    Emits the exact top-3 neighbors per fixed panel query under the
    CORRECTED geometry — the downstream read that shows the cleanup
    changed retrieval (pinned: rankings differ from raw cosine).

    Determinism across engines: centering is EXACT integer arithmetic
    at corpus scale (c_j = n·q_j − Σq_j over ×1024-quantized vectors —
    no float mean), the component is the power-iteration fold's
    integer micro-loadings (same 200-round replay as the PCA oracle),
    u·c folds as a bigint (order-free), and only the final projection
    ratio and cosine go double — single IEEE ops from identical
    bigints, rounded 6 dp with id tie-breaks (the brute_force_topk
    idiom). Precondition: n·|q| and Σu·c stay under int64 (holds to
    ~1e9 vectors at this quantization; pre-scale beyond).

    Scale shape: ONE d²-bounded scatter pass (shared with the PCA
    probe) + a 200-round driver fold over the 4096-row matrix; the
    correction itself is map-side per vector (broadcast 1-row stats +
    literal component); the panel top-k is the audited exact-baseline
    shape. Nothing data-sized shuffles except the scatter partials."""
    from stream_processing_project_spark.operators.similarity import (
        brute_force_topk,
    )

    dim = 64
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1024.0)"
            " AS BIGINT))"
        ).alias("qq"),
    )
    u = _pca_dominant_fold(pca_normalized_scatter(spark, sf_dir))
    out_schema = (
        "query_id bigint, neighbor_id bigint, cos_abtt double, rank int"
    )
    if not u:
        return spark.createDataFrame([], out_schema)
    u_arr = F.array(*[F.lit(int(u[j])).cast("long") for j in sorted(u)])
    uu = sum(v * v for v in u.values())
    stats = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[F.sum(F.col("qq")[i]).cast("bigint").alias(f"_s{i}") for i in range(dim)],
    ).select("n", F.array(*[F.col(f"_s{i}") for i in range(dim)]).alias("sx"))
    corr = q.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        F.zip_with("qq", "sx", lambda x, s: F.col("n") * x - s).alias("c"),
    )
    proj = (
        corr.withColumn(
            "udotc",
            F.aggregate(
                F.zip_with(F.col("c"), u_arr, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )
        .withColumn(
            "t", F.col("udotc").cast("double") / F.lit(float(uu))
        )
        .select(
            "vec_id",
            F.zip_with(
                F.col("c"),
                u_arr,
                lambda cj, uj: cj.cast("double")
                - uj.cast("double") * F.col("t"),
            ).alias("embedding"),
        )
    )
    panel = proj.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 5000))
    return brute_force_topk(proj, panel, k=3).select(
        "query_id",
        "neighbor_id",
        F.col("cos").alias("cos_abtt"),
        F.col("rank").cast("int").alias("rank"),
    )


@register(
    "similarity_graph_insert_recall",
    oracle=f"""
WITH {_nn_descent_cte(_NN_DESCENT_K, _NN_DESCENT_BSIZE, _NN_DESCENT_ITERS, _NN_DESCENT_SHORTLIST, emb_where=f" WHERE vec_id % {_INSERT_MOD} <> 7")},
{_graph_insert_cte(_INSERT_BEAM_W, _BEAM_ROUNDS, _NN_DESCENT_K, final_as="ins")},
exact AS (
  SELECT src, dst FROM (
    SELECT b.id AS src, c.id AS dst,
           row_number() OVER (
             PARTITION BY b.id
             ORDER BY round(list_cosine_similarity(b.v, c.v), 6) DESC, c.id
           ) AS rn
    FROM batch b JOIN emb c ON c.id <> b.id
  ) WHERE rn <= {_NN_DESCENT_K}
),
hits AS (
  SELECT count(*) AS n_hits FROM exact x
  JOIN ins g ON g.vec_id = x.src AND g.neighbor_id = x.dst
),
nb2 AS (SELECT count(*) AS n_batch FROM batch)
SELECT CAST(n_batch AS BIGINT) AS n_batch,
       CAST(n_hits AS BIGINT) AS n_hits,
       n_hits / (n_batch * {_NN_DESCENT_K}.0) AS recall
FROM nb2, hits
""",
)
def similarity_graph_insert_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the INSERTED nodes' routed edges against their exact
    top-k in the index corpus — the measured-quality row for
    incremental insert, exactly parallel to similarity_nn_descent_recall
    for the build: a served index that inserts via beam routing must
    know how much neighbor quality the O(batch) shortcut gives up vs
    the O(n) rebuild. The exact side broadcasts only the bounded batch
    against the index (brute_force_topk shape — corpus never shuffles),
    so the audit stays runnable at any index size; the division is RAW
    (identical integer operands → identical IEEE double either
    engine)."""
    edges = similarity_graph_insert_batch(spark, sf_dir).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    emb_all = t(spark, sf_dir, "embeddings")
    index_emb = emb_all.filter(F.col("vec_id") % _INSERT_MOD != 7)
    batch = emb_all.filter(
        (F.col("vec_id") % _INSERT_MOD == 7) & (F.col("vec_id") < 10000)
    )
    exact = similarity.brute_force_topk(
        index_emb, batch, k=_NN_DESCENT_K
    ).select(F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst"))
    hits = exact.join(edges, ["src", "dst"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    nb2 = batch.agg(F.count(F.lit(1)).alias("n_batch"))
    return nb2.crossJoin(F.broadcast(hits)).select(
        F.col("n_batch").cast("bigint").alias("n_batch"),
        F.col("n_hits").cast("bigint").alias("n_hits"),
        (
            F.col("n_hits")
            / (F.col("n_batch") * F.lit(float(_NN_DESCENT_K)))
        ).alias("recall"),
    )
