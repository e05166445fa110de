"""r10 pins: the GEMM ANN contract change (VERDICT r09 task 1).

The re-registered similarity_ann_lsh / similarity_ann_ivf run their
vectorized Arrow-batched index builds over EXACT int64 arithmetic, so
they must be bit-identical to the SQL-expression twins — that identity
is what justifies giving the GEMM names the expression paths' value-hash
oracles. Plus the standard empty-corpus and plan-shape sweeps for the
re-registered names.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_project_spark.operators import similarity
from stream_processing_project_spark.plans.registry import get

SF = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_gemm_lsh_bit_identical_to_expression_twin(spark):
    """Same (bits, k) ⇒ the GEMM-coded plan and the SQL-expression plan
    must agree on every row: codes are the same integers, so buckets,
    candidates, cosines and ranks all coincide."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    gemm = similarity.ann_lsh_topk_gemm(emb, q, k=3, bits=8)
    expr = similarity.ann_lsh_topk_oracled(emb, q, k=3, bits=8)
    assert _rows(gemm) == _rows(expr)


def test_gemm_ivf_bit_identical_to_expression_path(spark):
    """gemm=True must reproduce the expression-tree Lloyd trajectory,
    list assignment and probe ranking exactly — distances are the same
    int64s and both tie-breaks resolve to the smallest cid."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    kw = dict(k=16, iters=2, n_probe=4, topk=3)
    gemm = similarity.ivf_trained_topk(emb, gemm=True, **kw)
    expr = similarity.ivf_trained_topk(emb, gemm=False, **kw)
    assert _rows(gemm) == _rows(expr)


def test_r10_ann_registrations_survive_empty_corpus(spark, tmp_path):
    import pyarrow.parquet as pq

    d = tmp_path / "empty_r10"
    d.mkdir()
    src = pq.read_table(f"{SF}/embeddings.parquet")
    pq.write_table(src.slice(0, 0), str(d / "embeddings.parquet"))
    for name in (
        "similarity_ann_lsh",
        "similarity_ann_ivf",
        "streaming_embedding_neardup_banded",
    ):
        assert get(name).builder(spark, str(d)).count() == 0, name


def test_banded_neardup_non_vacuous_and_recall(spark):
    """The banded twin must do real work at the production threshold:
    (a) ≥ 98% of arrivals find their perturbed source (the one sf0.01
    band-miss is the documented miss_prob trade), (b) every found
    arrival matched EXACTLY its source (first_match_id = vec_id − 1e6,
    n_matches = 1 — the 0.8 verify kills every cross-vector candidate
    on the near-orthogonal fixture), (c) the output covers every
    arrival."""
    rows = get("streaming_embedding_neardup_banded").builder(spark, SF).collect()
    n_arrivals = sum(
        1
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter("vec_id % 5 = 0")
        .collect()
    )
    assert len(rows) == n_arrivals
    found = [r for r in rows if r["is_neardup"]]
    assert len(found) >= 0.98 * n_arrivals
    for r in found:
        assert r["n_matches"] == 1
        assert r["first_match_id"] == r["vec_id"] - 1_000_000


def test_banded_neardup_screen_plan_is_equi_join(spark):
    """Candidates must come from the (band, code) equi-join — never a
    Cartesian/nested-loop pass (checked on the batch shape of the same
    operator the streaming query uses)."""
    from tests.test_plan_properties import formatted_plan
    from stream_processing_project_spark.operators.similarity import (
        _quantize_expr,
        banded_neardup_screen,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    static = emb.selectExpr(
        "vec_id AS id_a", f"{_quantize_expr('embedding', 64)} AS qqa"
    )
    arriv = emb.filter("vec_id % 5 = 0").selectExpr(
        "vec_id + 1000000 AS id_b",
        f"{_quantize_expr('embedding', 64)} AS qqb",
    )
    plan = formatted_plan(
        banded_neardup_screen(static, arriv, bits=12, tables=24, threshold=0.8)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cross_doc_spans_are_real_shared_substrings(spark):
    """Every reported span must (a) be ≥ 8 tokens, (b) lie inside its
    document, (c) not overlap its doc's other spans, and (d) for a
    sample of spans, the span's LEADING 8-gram text must occur verbatim
    in at least one OTHER document — the cross-document guarantee the
    remove-list exists for."""
    rows = get("dedup_cross_doc_spans").builder(spark, SF).collect()
    assert rows, "fixture must contain seeded duplicate passages"
    docs = {
        r["doc_id"]: r["text"].strip().split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    by_doc: dict = {}
    for r in rows:
        toks = docs[r["doc_id"]]
        assert r["span_tokens"] >= 8
        assert r["span_tokens"] == r["span_end"] - r["span_start"] + 1
        assert 1 <= r["span_start"] <= r["span_end"] <= len(toks)
        by_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    for d, spans in by_doc.items():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1, f"overlapping spans in doc {d}"
    # cross-doc check on a deterministic sample
    sample = sorted(rows, key=lambda r: (r["doc_id"], r["span_start"]))[:25]
    for r in sample:
        toks = docs[r["doc_id"]]
        lead = " ".join(toks[r["span_start"] - 1 : r["span_start"] + 7])
        assert any(
            d != r["doc_id"] and lead in " ".join(t)
            for d, t in docs.items()
        ), f"span head not found in any other doc: {lead!r}"


def test_cross_doc_spans_plan_and_empty(spark, tmp_path):
    """No pairwise doc comparison anywhere (equi-joins + windows only),
    and an empty documents corpus yields an empty remove-list."""
    import pyarrow.parquet as pq

    from tests.test_plan_properties import formatted_plan

    plan = formatted_plan(get("dedup_cross_doc_spans").builder(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    d = tmp_path / "empty_docs"
    d.mkdir()
    src = pq.read_table(f"{SF}/documents.parquet")
    pq.write_table(src.slice(0, 0), str(d / "documents.parquet"))
    assert get("dedup_cross_doc_spans").builder(spark, str(d)).count() == 0


def test_cross_doc_apply_consistent_with_span_list(spark):
    """The apply pass must agree with its audit view: per doc,
    n_tokens_removed == Σ span_tokens from dedup_cross_doc_spans,
    kept + removed == the doc's token count, and clean_text re-tokenizes
    to exactly n_tokens_kept tokens."""
    spans = get("dedup_cross_doc_spans").builder(spark, SF).collect()
    removed_by_doc: dict = {}
    for r in spans:
        removed_by_doc[r["doc_id"]] = (
            removed_by_doc.get(r["doc_id"], 0) + r["span_tokens"]
        )
    rows = get("dedup_cross_doc_spans_apply").builder(spark, SF).collect()
    docs = {
        r["doc_id"]: r["text"].strip().split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert len(rows) == len(docs)
    touched = 0
    for r in rows:
        assert r["n_tokens_removed"] == removed_by_doc.get(r["doc_id"], 0)
        assert r["n_tokens_kept"] + r["n_tokens_removed"] == len(docs[r["doc_id"]])
        kept_toks = r["clean_text"].split(" ") if r["clean_text"] else []
        assert len(kept_toks) == r["n_tokens_kept"]
        if r["n_tokens_removed"]:
            touched += 1
    assert touched > 0, "fixture must exercise the cut path"


def test_prf_expansion_reorders_first_pass(spark):
    """PRF must genuinely change the ranking: the expanded second pass'
    top-10 must differ from plain BM25's top-10 in membership or order
    (a passthrough of the first-pass ranking cannot pass), with a clean
    1..10 rank column."""
    bm = get("retrieval_bm25_topk").builder(spark, SF).collect()
    pr = get("retrieval_prf_rocchio").builder(spark, SF).collect()
    assert sorted(r["rank"] for r in pr) == list(range(1, 11))
    bm10 = [r["doc_id"] for r in sorted(bm, key=lambda r: r["rank"])][:10]
    pr10 = [r["doc_id"] for r in sorted(pr, key=lambda r: r["rank"])]
    assert bm10 != pr10, "expansion must reorder or re-select the top-10"


def test_streaming_decontaminate_gate_matches_batch_sweep(spark):
    """The online gate must agree with the batch sweep wherever both
    speak: every doc text_decontaminate flags carries the same hit
    count in the gate; every other non-benchmark doc is admitted
    (contaminated = false, 0 hits); and the fixture genuinely exercises
    both verdicts."""
    batch = {
        r["doc_id"]: r["n_hit_grams"]
        for r in get("text_decontaminate").builder(spark, SF).collect()
    }
    gate = get("streaming_decontaminate_gate").builder(spark, SF).collect()
    assert batch, "fixture must contain contaminated docs"
    n_contam = 0
    for r in gate:
        if r["doc_id"] in batch:
            assert r["contaminated"] and r["n_hit_grams"] == batch[r["doc_id"]]
            n_contam += 1
        else:
            assert not r["contaminated"] and r["n_hit_grams"] == 0
    assert n_contam == len(batch)
    assert n_contam < len(gate), "some docs must be admitted"


def test_lr_apply_generalizes_on_held_out(spark):
    """The LR apply must be true held-out inference: the confusion
    matrix covers exactly the doc_id % 5 == 4 split, and held-out
    accuracy clears the majority-class baseline by a real margin
    (the teacher is linear in the features, so a working trainer
    should approach it; a constant predictor cannot pass)."""
    rows = get("text_classifier_apply_lr").builder(spark, SF).collect()
    assert rows
    n_test = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter("doc_id % 5 = 4")
        .count()
    )
    total = sum(r["n_docs"] for r in rows)
    assert total == n_test
    correct = sum(r["n_docs"] for r in rows if r["y_true"] == r["y_pred"])
    by_class: dict = {}
    for r in rows:
        by_class[r["y_true"]] = by_class.get(r["y_true"], 0) + r["n_docs"]
    majority = max(by_class.values()) / total
    acc = correct / total
    assert acc > majority + 0.1, (acc, majority)
    # margins must be consistent with predictions: positive-pred cells
    # carry positive mean margin, negative-pred cells negative
    for r in rows:
        if r["y_pred"] == 1:
            assert r["z_micro_sum"] > 0
        else:
            assert r["z_micro_sum"] <= 0


def test_filtered_ann_honors_predicate_and_is_nonvacuous(spark):
    """Every filtered-ANN neighbor must share its query's label (the
    pre-filter contract), and the filter must genuinely bite: at least
    one query's filtered top-5 differs from the unfiltered trained-IVF
    result set."""
    labels = {
        r["vec_id"]: r["label"]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    rows = get("similarity_ann_ivf_filtered").builder(spark, SF).collect()
    assert rows
    for r in rows:
        assert labels[r["neighbor_id"]] == labels[r["query_id"]], r
    unf = {
        (r["query_id"], r["neighbor_id"])
        for r in get("similarity_ann_ivf_trained").builder(spark, SF).collect()
    }
    filt = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert filt != unf
    assert any(labels[q] != labels[n] for q, n in unf), (
        "unfiltered baseline must contain cross-label pairs for the "
        "filter to be meaningful"
    )


def test_span_corruption_pairs_reconstruct(spark):
    """The (input, target) pair must be a lossless re-partition of the
    document: splicing each target span back over its sentinel in the
    input reproduces the original token sequence exactly; sentinel
    counts equal n_spans on both sides; corpus-wide masked fraction
    sits in the denoising band (10–30%); unmasked docs pass through
    verbatim."""
    import re

    rows = get("text_span_corruption").builder(spark, SF).collect()
    docs = {
        r["doc_id"]: r["text"].strip()
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert len(rows) == len(docs)
    total = masked = 0
    reconstructed = 0
    for r in rows:
        orig = docs[r["doc_id"]]
        n_tok = len(orig.split(" "))
        total += n_tok
        masked += r["n_masked_tokens"]
        if r["n_spans"] == 0:
            assert r["input_text"] == orig
            assert r["target_text"] == ""
            continue
        assert len(re.findall(r"<extra_id_\d+>", r["input_text"])) == r["n_spans"]
        spans = re.split(r"<extra_id_\d+> ?", r["target_text"])[1:]
        assert len(spans) == r["n_spans"]
        out = r["input_text"]
        for k, s in enumerate(spans):
            out = out.replace(f"<extra_id_{k}>", s.strip())
        assert out == orig, r["doc_id"]
        reconstructed += 1
    assert reconstructed > 0
    assert 0.10 <= masked / total <= 0.30, masked / total


def test_gemm_paths_invariant_to_arrow_batch_size(spark):
    """The GEMM udfs must be batch-boundary-free: forcing tiny Arrow
    batches (7 rows) must reproduce the default-batch results exactly —
    int64 matmul has no cross-row state, so any difference would mean a
    batch-shape bug (stacking, reshape, weights broadcast)."""
    from stream_processing_project_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        small_lsh = _rows(similarity.ann_lsh_topk_gemm(emb, q, k=5, bits=8))
        small_ivf = _rows(
            similarity.ivf_trained_topk(
                emb, k=16, iters=2, n_probe=4, topk=3, gemm=True
            )
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    big_lsh = _rows(similarity.ann_lsh_topk_gemm(emb, q, k=5, bits=8))
    big_ivf = _rows(
        similarity.ivf_trained_topk(
            emb, k=16, iters=2, n_probe=4, topk=3, gemm=True
        )
    )
    assert small_lsh == big_lsh
    assert small_ivf == big_ivf


def test_parquet_sink_matches_memory_sink(spark, tmp_path):
    """run_to_completion(sink='parquet') must return exactly the rows
    the memory sink returns for the same bounded stream — the sink is a
    transport choice, not a semantics one — and must come back as a
    DISTRIBUTED read (not a LocalRelation), which is the whole point."""
    import pyarrow.parquet as pq

    from stream_processing_project_spark.streaming import pipeline

    d = tmp_path / "mini_emb"
    d.mkdir()
    src = pq.read_table(f"{SF}/embeddings.parquet")
    pq.write_table(src.slice(0, 50), str(d / "embeddings.parquet"))

    def stream():
        return (
            pipeline.file_embedding_stream(spark, str(d))
            .selectExpr("vec_id", "label")
        )

    mem = sorted(tuple(r) for r in pipeline.run_to_completion(stream()).collect())
    par_df = pipeline.run_to_completion(stream(), sink="parquet")
    par = sorted(tuple(r) for r in par_df.collect())
    assert mem == par and len(mem) == 50
    assert "LocalRelation" not in par_df._jdf.queryExecution().toString()


def test_r10_ann_plan_shapes(spark):
    """Candidates must come from equi-joins on bucket/cid codes — never
    an all-pairs loop (the blocked-similarity invariant the oracled
    twins already pin, now applied to the GEMM registrations)."""
    from tests.test_plan_properties import formatted_plan

    for name in ("similarity_ann_lsh", "similarity_ann_ivf"):
        plan = formatted_plan(get(name).builder(spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
