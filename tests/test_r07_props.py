"""r07 regression pins: ADVICE.md items + new-operator properties."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_SMOKE = "/root/testdata/sf0.001"


def test_classifier_empty_corpus_returns_empty_frame(spark, tmp_path):
    """ADVICE r06: text_classifier_train_lr executed eagerly and crashed
    (TypeError on NULL gradient sums / ZeroDivision on nd=0) when the
    documents table was empty. It must return the empty output frame."""
    src = pq.read_table(os.path.join(SF_SMOKE, "documents.parquet"))
    empty_dir = tmp_path / "empty_sf"
    empty_dir.mkdir()
    pq.write_table(src.slice(0, 0), str(empty_dir / "documents.parquet"))

    from stream_processing_project_spark.plans.registry import get

    out = get("text_classifier_train_lr").builder(spark, str(empty_dir))
    assert out.count() == 0
    assert out.columns == [
        "n_docs",
        "w0_micro",
        "w1_micro",
        "w2_micro",
        "w3_micro",
        "n_correct",
        "accuracy",
    ]


def test_half_away_decimal_matches_half_up_on_binary_boundary():
    """ADVICE r06: floor(abs(x)+0.5) breaks on the 0.49999999999999994
    class (abs(x)+0.5 rounds up across an integer boundary in binary).
    The Decimal path must round exactly like decimal HALF_UP."""
    import decimal

    def half_away(x: float) -> int:
        return int(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP
            )
        )

    # the canonical counterexample: 0.49999999999999994 + 0.5 == 1.0 in
    # binary, so the floor formula yields 1 — decimal HALF_UP says 0
    assert half_away(0.49999999999999994) == 0
    assert half_away(-0.49999999999999994) == 0
    assert half_away(0.5) == 1
    assert half_away(-0.5) == -1
    assert half_away(2.5) == 3
    assert half_away(-2.5) == -3
    assert half_away(1.4999999999999998) == 1


def test_stateful_session_islands_merge_across_batches(spark):
    """session_window_stream: out-of-order arrivals in separate batches
    form separate open islands that a later bridging event MERGES into
    one session; the event-time timer flushes exactly the sessions the
    final watermark closes."""
    import tempfile

    from stream_processing_project_spark.operators.stateful import (
        session_window_stream,
    )
    from stream_processing_project_spark.streaming import pipeline

    src = tempfile.mkdtemp(prefix="spe-sess-")
    ddl = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    from tests.conftest import spool_parquet

    # batch 1: two islands 40 min apart (gap 30 min → separate sessions
    # so far)
    spool_parquet(
        src,
        [
            (1, "2024-01-01 00:00:00", 7, "a", 1.0, "{}"),
            (2, "2024-01-01 00:40:00", 7, "a", 2.0, "{}"),
        ],
        ddl,
    )
    stream = (
        spark.readStream.schema(ddl)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = session_window_stream(stream)
    import uuid

    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", pipeline.checkpoint_dir(name))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: the BRIDGE (00:20, within 30 min of both islands) —
        # out-of-order, but on time (wm = 00:40 - 1h < epoch after
        # batch 1)
        spool_parquet(src, [(3, "2024-01-01 00:20:00", 7, "a", 4.0, "{}")], ddl)
        q.processAllAvailable()
        # batch 3: advance the watermark far enough to close the merged
        # session (wm = 03:00 - 1h = 02:00 > 00:40+30min)
        spool_parquet(src, [(4, "2024-01-01 03:00:00", 8, "a", 0.5, "{}")], ddl)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        (r.user_id, r.sess_start, r.n_events, r.sum_val)
        for r in spark.table(name).collect()
    }
    # ONE merged session for user 7 covering all three events
    assert (7, "2024-01-01 00:00:00", 3, 7.0) in rows
    # the islands were never emitted separately
    assert not any(u == 7 and n < 3 for (u, _, n, _) in rows)
    # user 8's session is still open (nothing past its close time)
    assert not any(u == 8 for (u, _, n, _) in rows)


def test_rank_sketch_merges_losslessly_across_shards(spark):
    """Bottom-k-by-hash is a true mergeable sketch: sketching 3 disjoint
    shards and re-taking bottom-k of their union reproduces the
    whole-table sketch (and therefore identical quantile estimates)."""
    from pyspark.sql import functions as F

    from stream_processing_project_spark.operators.profiling import (
        rank_sketch,
        rank_sketch_quantiles,
    )
    from stream_processing_project_spark.sources.fixtures import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    key = F.col("l_orderkey") * 8 + F.col("l_linenumber")

    whole = rank_sketch(li, "l_extendedprice", key)
    shard_sketches = [
        rank_sketch(li.filter(F.col("l_orderkey") % 3 == i), "l_extendedprice", key)
        for i in range(3)
    ]
    merged_pool = shard_sketches[0].unionAll(shard_sketches[1]).unionAll(
        shard_sketches[2]
    )
    merged = merged_pool.orderBy("h", "v").limit(1024)

    a = sorted((r.h, r.v) for r in whole.collect())
    b = sorted((r.h, r.v) for r in merged.collect())
    assert a == b
    qa = sorted(tuple(r) for r in rank_sketch_quantiles(whole).collect())
    qb = sorted(tuple(r) for r in rank_sketch_quantiles(merged).collect())
    assert qa == qb and len(qa) == 7


def test_rank_sketch_quantiles_within_dkw_bound(spark):
    """The DKW guarantee the docstring claims: every estimated quantile's
    true rank is within sqrt(ln(2/0.01)/(2*1024)) ≈ 5.1% of its target
    (using the 99%-confidence radius; the sf0.001 sample is ~half the
    table so the real error is far smaller)."""
    from stream_processing_project_spark.plans.registry import get

    rows = get("profile_quantile_sketch").builder(spark, SF_SMOKE).collect()
    assert len(rows) == 7
    for r in rows:
        assert abs(r.true_rank_ppm / 10000.0 - r.q_pct) <= 5.2, (
            r.q_pct,
            r.true_rank_ppm,
        )


def test_frequent_itemsets_no_basket_cube_blowup(spark):
    """A-priori candidate generation must stay equi-join-shaped: no
    CartesianProduct, and the only BroadcastNestedLoopJoin nodes are
    the 1-row minsup-scalar crossJoins (the accepted scalar idiom) —
    never a basket×basket×basket expansion."""
    import contextlib
    import io

    from stream_processing_project_spark.plans.registry import all_queries

    df = all_queries()["olap_frequent_itemsets"].builder(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    # every BNLJ is a 1-row minsup-scalar crossJoin: 3 level filters ×
    # the plan replays of the tiny ms aggregate (the pair table is
    # deliberately NOT checkpointed after the r07 ×100 OOM, so the L2/L3
    # branches each re-derive it and carry their own scalar join). The
    # bound is the scalar-join multiplicity ceiling — a data×data loop
    # would also trip the Cartesian assert and the wall-clock smoke.
    assert plan.count("BroadcastNestedLoopJoin") <= 12, plan


def test_frequent_itemsets_downward_closure(spark):
    """Every frequent k-itemset's (k−1)-subsets are frequent at the same
    minsup — the invariant A-priori's candidate bound rests on."""
    from stream_processing_project_spark.plans.registry import all_queries

    rows = all_queries()["olap_frequent_itemsets"].builder(spark, SF_SMOKE).collect()
    l1 = {r.i1 for r in rows if r.k == 1}
    l2 = {(r.i1, r.i2) for r in rows if r.k == 2}
    l3 = {(r.i1, r.i2, r.i3) for r in rows if r.k == 3}
    assert l1, "level 1 empty"
    for a, b in l2:
        assert a in l1 and b in l1
    for a, b, c in l3:
        assert (a, b) in l2 and (b, c) in l2 and (a, c) in l2


def test_ivfpq_e2e_full_coverage_equals_exact(spark):
    """IVF-PQ with every list probed and an unbounded shortlist
    degenerates to exact L2 top-k (== the trained-IVF full-probe
    result) — the rerank stage guarantees it regardless of how coarse
    the ADC approximation is."""
    from stream_processing_project_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    exact = sorted(
        (r.query_id, r.neighbor_id, r.dist_sq, r.rank)
        for r in similarity.ivf_trained_topk(emb, n_probe=8, topk=5).collect()
    )
    full = sorted(
        (r.query_id, r.neighbor_id, r.dist_sq, r.rank)
        for r in similarity.ivfpq_topk(emb, n_probe=8, shortlist=10**6).collect()
    )
    assert exact == full


def test_ivfpq_e2e_recall_floor(spark):
    """Default serving config (2/8 probes, m=16×32-code ADC, top-50
    shortlist): recall@5 vs exact ≥ 0.7 on the sf0.001 corpus
    (deterministic pipeline — the measured value is exactly
    reproducible, 0.72 at this fixture)."""
    from stream_processing_project_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_trained_topk(emb, n_probe=8, topk=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivfpq_topk(emb).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.7


def test_prefix_filter_jaccard_is_lossless(spark):
    """Pigeonhole guarantee: prefix filtering at t=0.7 returns EXACTLY
    the brute-force exact-Jaccard pair set over the same trigram
    shingles (all-pairs shingle join, no prefix restriction)."""
    from pyspark.sql import functions as F

    from stream_processing_project_spark.operators.dedup import (
        _ngrams,
        prefix_filter_jaccard_pairs,
    )
    from stream_processing_project_spark.sources.fixtures import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    fast = {
        (r.doc_a, r.doc_b, r.n_common, r.n_a, r.n_b)
        for r in prefix_filter_jaccard_pairs(docs).collect()
    }
    sh = _ngrams(docs, "text", 3).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("L"))
    inter = (
        sh.select(F.col("doc_id").alias("doc_a"), "sh")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "sh"), "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    brute = {
        (r.doc_a, r.doc_b, r.n_common, r.n_a, r.n_b)
        for r in inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("L").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("L").alias("n_b")),
            "doc_b",
        )
        .filter(
            10 * F.col("n_common")
            >= 7 * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        )
        .collect()
    }
    assert fast == brute
    assert fast, "fixture's planted near-dups must appear"


def test_trained_similarity_ops_survive_empty_corpus(spark, tmp_path):
    """The ADVICE-r06 empty-corpus class, swept across the eager
    builders (r07): kmeans_fit over zero rows yields an empty centroid
    list, and the shared _centroid_pairs expression must still ANALYZE
    (typed null array) so the trained-similarity family returns empty
    frames instead of raising INVALID_EXTRACT_BASE_FIELD_TYPE."""
    import pyarrow.parquet as pq2

    d = tmp_path / "empty_emb"
    d.mkdir()
    src = pq2.read_table(os.path.join(SF_SMOKE, "embeddings.parquet"))
    pq2.write_table(src.slice(0, 0), str(d / "embeddings.parquet"))

    from stream_processing_project_spark.plans.registry import get

    for name in (
        "similarity_kmeans_train",
        "similarity_ann_ivf_trained",
        "similarity_ann_ivfpq_e2e",
    ):
        assert get(name).builder(spark, str(d)).count() == 0, name


def test_nn_descent_graph_properties(spark):
    """NN-Descent (r07 late addition): the graph must (a) emit exactly
    k=4 ranked neighbors per node, (b) strictly improve on (or match)
    the hash-bucket seed graph's neighbor quality, and (c) never pair a
    node with itself."""
    from pyspark.sql import functions as F

    from stream_processing_project_spark.operators.similarity import (
        nn_descent_graph,
    )

    emb = spark.read.parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
    n = emb.count()
    # one round keeps the test cheap; every property here is
    # iteration-count-independent (the 4-round point is covered by the
    # registered recall query's floor test)
    graph = nn_descent_graph(emb, k=4, init_buckets=16, iters=1)
    per_node = graph.groupBy("vec_id").count().collect()
    assert all(r["count"] == 4 for r in per_node)
    assert len(per_node) == n
    assert graph.filter(F.col("vec_id") == F.col("neighbor_id")).count() == 0
    # descent must not make any node WORSE than its seed (top-1 cosine
    # is monotone in the candidate set, and the seed edges are always
    # candidates in round 1)
    seed = nn_descent_graph(emb, k=4, init_buckets=16, iters=0)
    s1 = {
        r["vec_id"]: r["best"]
        for r in seed.groupBy("vec_id").agg(F.max("cos").alias("best")).collect()
    }
    g1 = {
        r["vec_id"]: r["best"]
        for r in graph.groupBy("vec_id").agg(F.max("cos").alias("best")).collect()
    }
    assert all(g1[k_] >= s1[k_] for k_ in s1)


def test_nn_descent_recall_beats_seed_recall(spark):
    """The 2-round descent's panel recall must beat the seed graph's —
    the property that justifies the iterations."""
    from stream_processing_project_spark.plans.registry import get

    row = (
        get("similarity_nn_descent_recall").builder(spark, SF_SMOKE).collect()[0]
    )
    assert row["n_panel"] > 0
    # measured 0.715 at the registered k=8/4-round point; the floor
    # leaves container-jitter-free determinism headroom (the value is
    # exact, not stochastic — any drop means the algorithm changed)
    assert row["recall"] >= 0.6, row


def test_dsir_importance_prefers_target_like_docs(spark):
    """DSIR (r07 late addition): the importance weights exist for every
    doc, the sampled set is exactly 100 (fixture has ≥100 docs), and
    target-language docs must be over-represented in the top sample
    relative to the corpus base rate — the defining property of
    importance resampling toward a target distribution."""
    from stream_processing_project_spark.plans.registry import get

    out = get("sampling_dsir_importance").builder(
        spark, "/root/testdata/sf0.01"
    )
    rows = out.collect()
    assert len(rows) == 100
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, 101)
    )
    en_share_sample = sum(1 for r in rows if r["lang"] == "en") / 100.0
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    en_share_corpus = docs.filter("lang = 'en'").count() / docs.count()
    assert en_share_sample > en_share_corpus, (
        en_share_sample,
        en_share_corpus,
    )


def test_dsir_and_nn_descent_survive_empty_corpus(spark, tmp_path):
    """Empty-corpus sweep extended to the r07 late additions."""
    import pyarrow.parquet as pq2

    d = tmp_path / "empty_all"
    d.mkdir()
    for tbl in ("documents", "embeddings"):
        src = pq2.read_table(os.path.join(SF_SMOKE, f"{tbl}.parquet"))
        pq2.write_table(src.slice(0, 0), str(d / f"{tbl}.parquet"))

    from stream_processing_project_spark.plans.registry import get

    for name in (
        "similarity_nn_descent_graph",
        "similarity_nn_descent_recall",
        "sampling_dsir_importance",
    ):
        out = get(name).builder(spark, str(d))
        if name == "similarity_nn_descent_recall":
            assert out.count() == 1  # 1-row aggregate over empty panel
        else:
            assert out.count() == 0, name


def test_nb_classifier_learns_the_planted_teacher(spark):
    """NB trainer (r07 late addition): the confusion matrix must show
    the model recovering the planted stopword-ratio teacher well above
    the majority baseline (0.516 at sf0.01) — the same teacher-student
    check the LR trainer carries."""
    from stream_processing_project_spark.plans.registry import get

    rows = get("text_classifier_train_nb").builder(
        spark, "/root/testdata/sf0.01"
    ).collect()
    total = sum(r["n_docs"] for r in rows)
    diag = sum(r["n_docs"] for r in rows if r["true_cls"] == r["pred_cls"])
    assert total == 500
    assert diag / total >= 0.75, rows


def test_retrieval_eval_ndcg_invariants(spark):
    """nDCG eval (r07 late addition): one row per panel query; nDCG in
    [0,1]; ideal DCG dominates DCG; MRR consistent with n_rel."""
    from stream_processing_project_spark.plans.registry import get

    rows = get("retrieval_eval_ndcg").builder(spark, SF_SMOKE).collect()
    assert len(rows) == 25
    for r in rows:
        assert 0.0 <= r["ndcg"] <= 1.0, r
        assert r["idcg_micro"] >= r["dcg_micro"], r
        assert (r["mrr_micro"] > 0) == (r["n_rel"] > 0), r
        assert (r["ndcg"] > 0) == (r["n_rel"] > 0), r


def test_nb_and_ndcg_survive_empty_corpus(spark, tmp_path):
    """Empty-corpus sweep for the two final r07 additions."""
    import pyarrow.parquet as pq2

    d = tmp_path / "empty_final"
    d.mkdir()
    for tbl in ("documents", "embeddings"):
        src = pq2.read_table(os.path.join(SF_SMOKE, f"{tbl}.parquet"))
        pq2.write_table(src.slice(0, 0), str(d / f"{tbl}.parquet"))

    from stream_processing_project_spark.plans.registry import get

    for name in ("text_classifier_train_nb", "retrieval_eval_ndcg"):
        assert get(name).builder(spark, str(d)).count() == 0, name


def test_dtw_pairs_invariants_and_l1_dominance(spark):
    """Banded DTW (r07 late addition): all C(6,2)=15 panel pairs at
    sf0.01; distances non-negative; and for EQUAL-length series DTW
    must never exceed the lock-step L1 distance (the diagonal is one
    admissible warping path) — the inequality that pins the DP is a
    minimum over paths and not some other aggregate."""
    import duckdb

    from stream_processing_project_spark.plans.registry import get

    rows = get("timeseries_dtw_pairs").builder(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 15
    for r in rows:
        assert r["dtw_micro"] >= 0
        assert 1 <= r["n_a"] <= 31 and 1 <= r["n_b"] <= 31

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/events.parquet')"
    )
    l1 = {
        (a, b): v
        for a, b, v in con.execute("""
WITH daily AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS tot
  FROM events WHERE user_id % 25 = 0 AND user_id < 150
  GROUP BY user_id, day
),
series AS (
  SELECT user_id, list(tot ORDER BY day) AS s FROM daily GROUP BY user_id
)
SELECT a.user_id, b.user_id,
       CAST(list_sum(list_transform(range(1, len(a.s) + 1),
            i -> abs(a.s[i] - b.s[i]))) AS BIGINT)
FROM series a JOIN series b
ON a.user_id < b.user_id AND len(a.s) = len(b.s)
""").fetchall()
    }
    checked = 0
    for r in rows:
        key = (r["user_a"], r["user_b"])
        if key in l1:
            assert r["dtw_micro"] <= l1[key], (key, r["dtw_micro"], l1[key])
            checked += 1
    assert checked >= 1  # the fixture has equal-length panel series


def test_dtw_pairs_single_node_panel_and_empty(spark, tmp_path):
    """At sf0.001 the capped panel holds one user → the a<b self-join
    yields zero pairs; an empty events table also analyzes and returns
    empty (the r07 empty-corpus sweep class)."""
    import pyarrow.parquet as pq2

    from stream_processing_project_spark.plans.registry import get

    assert get("timeseries_dtw_pairs").builder(spark, SF_SMOKE).count() == 0

    d = tmp_path / "empty_dtw"
    d.mkdir()
    src = pq2.read_table(os.path.join(SF_SMOKE, "events.parquet"))
    pq2.write_table(src.slice(0, 0), str(d / "events.parquet"))
    assert get("timeseries_dtw_pairs").builder(spark, str(d)).count() == 0


def test_dbscan_partition_and_label_invariants(spark):
    """DBSCAN (r07 late addition): roles partition the corpus exactly;
    every non-noise cluster label IS a core point's id (min-id label);
    core labels never exceed the member's own id; noise is -1."""
    from stream_processing_project_spark.plans.registry import get

    rows = get("similarity_dbscan_clusters").builder(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 500
    assert len({r["vec_id"] for r in rows}) == 500
    cores = {r["vec_id"] for r in rows if r["role"] == "core"}
    assert cores, "fixture must produce some core points"
    for r in rows:
        if r["role"] == "noise":
            assert r["cluster"] == -1
        else:
            assert r["cluster"] in cores, r
            if r["role"] == "core":
                assert r["cluster"] <= r["vec_id"], r


def test_dbscan_survives_empty_corpus(spark, tmp_path):
    import pyarrow.parquet as pq2

    from stream_processing_project_spark.plans.registry import get

    d = tmp_path / "empty_dbscan"
    d.mkdir()
    src = pq2.read_table(os.path.join(SF_SMOKE, "embeddings.parquet"))
    pq2.write_table(src.slice(0, 0), str(d / "embeddings.parquet"))
    assert get("similarity_dbscan_clusters").builder(spark, str(d)).count() == 0


def test_kcenter_radius_is_monotone_nonincreasing(spark):
    """Greedy k-center (r07 late addition): Gonzalez's picked distances
    are non-increasing by construction (each pick is the current
    covering radius, and adding a center can only shrink min-dists);
    centers are distinct; round 1 is the min-id seed at distance 0."""
    from stream_processing_project_spark.plans.registry import get

    rows = sorted(
        get("sampling_kcenter_diversity").builder(
            spark, "/root/testdata/sf0.01"
        ).collect(),
        key=lambda r: r["round"],
    )
    assert len(rows) == 8
    assert rows[0]["round"] == 1 and rows[0]["dist_sq"] == 0
    assert len({r["center_id"] for r in rows}) == 8
    dists = [r["dist_sq"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:])), dists
    assert dists[-1] > 0


def test_kcenter_survives_empty_corpus(spark, tmp_path):
    import pyarrow.parquet as pq2

    from stream_processing_project_spark.plans.registry import get

    d = tmp_path / "empty_kc"
    d.mkdir()
    src = pq2.read_table(os.path.join(SF_SMOKE, "embeddings.parquet"))
    pq2.write_table(src.slice(0, 0), str(d / "embeddings.parquet"))
    out = get("sampling_kcenter_diversity").builder(spark, str(d))
    assert out.count() == 0
    assert out.columns == ["round", "center_id", "dist_sq"]
