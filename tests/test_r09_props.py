"""Property and plan-shape pins for the r09 additions:
retrieval_rerank_cross (two-stage rerank) and
similarity_graph_insert_batch (incremental graph-ANN insert), plus the
empty-corpus sweep extension."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_project_spark.plans.registry import get

SF = "/root/testdata/sf0.01"


def test_rerank_is_candidates_only_and_reorders(spark):
    """The rerank stage must (a) emit exactly 10 ranked rows drawn ONLY
    from the BM25 top-50 candidate pool (stage 2 never scores outside
    the retrieved set — the economics of the pattern), (b) genuinely
    REORDER: at least one top-10 doc was outside BM25's own top-10
    (i.e. the interaction features changed the outcome, so a
    passthrough of the stage-1 order cannot pass), and (c) keep qcov
    within the 8-term query bound with internally consistent scores."""
    rows = get("retrieval_rerank_cross").builder(spark, SF).collect()
    assert len(rows) == 10
    assert sorted(r["rank"] for r in rows) == list(range(1, 11))
    for r in rows:
        assert 1 <= r["qcov"] <= 8
        assert r["qtf_sum"] >= r["qcov"]  # each matched term occurs >= once
        assert r["first_pos"] >= 1

    bm = get("retrieval_bm25_topk").builder(spark, SF).collect()
    bm_ids = [r["doc_id"] for r in sorted(bm, key=lambda r: r["rank"])]
    rr_ids = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert set(rr_ids) - set(bm_ids), "rerank must promote beyond bm25 top-20"
    # stage-1 containment: rebuild the top-50 candidate list the same
    # deterministic way and check every reranked doc came from it
    from stream_processing_project_spark.plans.extensions import (
        retrieval_rerank_cross,  # noqa: F401  (import anchors the module)
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from stream_processing_project_spark.operators.text import words

    toks = docs.select(
        "doc_id",
        F.size(words(F.col("text"))).alias("dl"),
        F.explode(words(F.col("text"))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.max("dl").alias("dl"), F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    top8 = {
        r["term"]
        for r in dfreq.orderBy(F.col("df").desc(), "term").limit(8).collect()
    }
    cand_pool = {
        r["doc_id"]
        for r in tf.filter(F.col("term").isin(top8))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert set(rr_ids) <= cand_pool


def test_graph_insert_edges_are_valid_and_bounded(spark):
    """Incremental insert: every batch node (vec_id % 20 == 7, < 10000)
    gets ≤ k ranked edges; edges point ONLY into the index corpus
    (never at the batch itself — those nodes aren't in the graph yet),
    never self-loop, and ranks are dense from 1. The routed edges must
    be genuinely useful: for each inserted node, its best edge cosine
    must be positive on this fixture (routing reached the neighborhood,
    not a random far node)."""
    rows = get("similarity_graph_insert_batch").builder(spark, SF).collect()
    assert rows, "fixture batch must be non-empty"
    by_node: dict = {}
    for r in rows:
        assert r["vec_id"] % 20 == 7 and r["vec_id"] < 10000
        assert r["neighbor_id"] % 20 != 7 or r["neighbor_id"] >= 10000
        assert r["neighbor_id"] != r["vec_id"]
        by_node.setdefault(r["vec_id"], []).append(r)
    for node, es in by_node.items():
        ranks = sorted(e["rank"] for e in es)
        assert ranks == list(range(1, len(es) + 1)), node
        assert len(es) <= 8
        assert max(e["cos"] for e in es) > 0, node


def test_graph_insert_plan_has_no_cartesian(spark):
    """The insert plan must stay equi-join shaped: no CartesianProduct;
    the only nested-loop join is the broadcast 1-row entry node (the
    beam family's pinned allowance)."""
    from tests.test_plan_properties import formatted_plan

    df = get("similarity_graph_insert_batch").builder(spark, SF)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_r09_ops_survive_empty_corpus(spark, tmp_path):
    """Empty-corpus sweep for the r09 additions."""
    import pyarrow.parquet as pq

    d = tmp_path / "empty_r09"
    d.mkdir()
    for tbl in ("embeddings", "documents"):
        src = pq.read_table(f"{SF}/{tbl}.parquet")
        pq.write_table(src.slice(0, 0), str(d / f"{tbl}.parquet"))
    for name in (
        "similarity_graph_insert_batch",
        "retrieval_rerank_cross",
        "similarity_graph_delete_compact",
    ):
        assert get(name).builder(spark, str(d)).count() == 0, name


def test_graph_delete_compact_heals_edges(spark):
    """Delete/compact: no tombstoned node (vec_id % 20 == 3) appears on
    either side of the compacted adjacency; every healed node keeps ≤ k
    dense-ranked edges; and healing genuinely works — at least one
    survivor that pointed at a tombstone in the original graph has an
    inherited (previously-absent) neighbor in its compacted list."""
    orig = {
        (r["vec_id"], r["neighbor_id"])
        for r in get("similarity_nn_descent_graph").builder(spark, SF).collect()
    }
    rows = get("similarity_graph_delete_compact").builder(spark, SF).collect()
    assert rows
    by_node: dict = {}
    for r in rows:
        assert r["vec_id"] % 20 != 3
        assert r["neighbor_id"] % 20 != 3
        assert r["neighbor_id"] != r["vec_id"]
        by_node.setdefault(r["vec_id"], []).append(r)
    healed_with_new = 0
    broken_srcs = {s for (s, d) in orig if s % 20 != 3 and d % 20 == 3}
    for node, es in by_node.items():
        assert sorted(e["rank"] for e in es) == list(range(1, len(es) + 1))
        assert len(es) <= 8
        if node in broken_srcs and any(
            (node, e["neighbor_id"]) not in orig for e in es
        ):
            healed_with_new += 1
    assert broken_srcs, "fixture must exercise the healing path"
    assert healed_with_new >= 1


def test_graph_delete_compact_plan_shape(spark):
    """Compaction must stay equi-join shaped: no CartesianProduct and
    no nested-loop joins at all (unlike beam/insert there is no 1-row
    entry broadcast here)."""
    from tests.test_plan_properties import formatted_plan

    df = get("similarity_graph_delete_compact").builder(spark, SF)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_nb_apply_generalizes_to_held_out(spark):
    """NB inference (train on doc_id % 5 != 0, score the unseen 20%):
    held-out accuracy must clearly beat the majority baseline (0.86 vs
    0.59 measured at sf0.01 — the floor leaves drift headroom only,
    a majority-class predictor cannot pass), margins are positive by
    construction (best minus runner-up), and every scored doc is a
    held-out doc (the confusion total is the test-split size)."""
    rows = get("text_classifier_apply_nb").builder(spark, SF).collect()
    tot = sum(r["n_docs"] for r in rows)
    n_test = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") % 5 == 0)
        .count()
    )
    assert tot == n_test
    acc = sum(r["n_docs"] for r in rows if r["true_cls"] == r["pred_cls"]) / tot
    maj = (
        max(
            sum(r["n_docs"] for r in rows if r["true_cls"] == c)
            for c in {"hi", "lo"}
        )
        / tot
    )
    assert acc >= 0.75, acc
    assert acc > maj + 0.1, (acc, maj)
    assert all(r["sum_margin_micro"] > 0 for r in rows)


def test_abtt_changes_retrieval_and_survives_empty(spark, tmp_path):
    """ABTT post-processing: each panel query gets exactly top-3
    dense-ranked neighbors, and the corrected geometry genuinely
    differs from raw cosine (≥1 ranked cell changes — 4/30 measured
    at sf0.01; an identity post-process cannot pass). Empty corpus →
    empty output (the driver-fold guard path)."""
    import pyarrow.parquet as pq

    from stream_processing_project_spark.operators.similarity import (
        brute_force_topk,
    )

    rows = get("vector_abtt_postprocess").builder(spark, SF).collect()
    per_q: dict = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert per_q
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    panel = emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 5000))
    raw = brute_force_topk(emb, panel, k=3).collect()
    a = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in rows}
    b = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in raw}
    assert sum(1 for k in a if a[k] != b.get(k)) >= 1

    d = tmp_path / "empty_abtt"
    d.mkdir()
    src = pq.read_table(f"{SF}/embeddings.parquet")
    pq.write_table(src.slice(0, 0), str(d / "embeddings.parquet"))
    assert get("vector_abtt_postprocess").builder(spark, str(d)).count() == 0


def test_graph_insert_recall_is_consistent(spark):
    """Insert-recall audit: internally consistent (n_hits ≤ n_batch·k,
    recall = the raw division) and the wide-beam routed insert matches
    build-grade neighbor quality (0.81 at sf0.01 with
    _INSERT_BEAM_W=32 vs the full build's 0.79 — the width sweep that
    picked 32 is in the constant's comment; floor at 0.6 leaves drift
    headroom while the serving-width router measured 0.46 and a
    broken one lands near 1/|index| ≈ 0)."""
    row = get("similarity_graph_insert_recall").builder(spark, SF).collect()[0]
    assert row["n_batch"] > 0
    assert 0 <= row["n_hits"] <= row["n_batch"] * 8
    assert row["recall"] == row["n_hits"] / (row["n_batch"] * 8.0)
    assert row["recall"] >= 0.6


def test_streaming_embedding_neardup_is_stateless_and_nontrivial(spark):
    """Streaming embedding near-dup: verdict covers every corpus vector,
    matches are genuinely found on the fixture (201/500 at sf0.01 with
    the 0.35 tail threshold), every match points at an EARLIER id
    (keep-first), and non-dup rows carry the (False, 0, None) shape."""
    rows = get("streaming_embedding_neardup").builder(spark, SF).collect()
    n_corpus = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(rows) == n_corpus
    dups = [r for r in rows if r["is_neardup"]]
    assert dups, "fixture must produce near-dups at the tail threshold"
    for r in rows:
        if r["is_neardup"]:
            assert r["first_match_id"] < r["vec_id"]
            assert r["n_matches"] >= 1
        else:
            assert r["n_matches"] == 0 and r["first_match_id"] is None
