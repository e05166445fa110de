"""Round-11 property pins: ADVICE r10 fixes (parquet-sink error
semantics + tmp hygiene, LR-apply oracle empty-train parity) and the
r11 verdict tasks as they land."""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from stream_processing_project_spark.plans.registry import get

SF = "/root/testdata/sf0.01"


def _spe_tmp_dirs() -> set[str]:
    td = tempfile.gettempdir()
    return set(glob.glob(os.path.join(td, "spe-log-*"))) | set(
        glob.glob(os.path.join(td, "spe-ckpt-*"))
    )


def test_parquet_sink_cleans_staging_and_checkpoint(spark, tmp_path):
    """ADVICE r10: every parquet-sink invocation used to strand its
    staging dir + checkpoint under /tmp. After run_to_completion
    returns, the rows must survive (materialized off the files) and no
    new spe-log-* / spe-ckpt-* dirs may remain."""
    import pyarrow.parquet as pq

    from stream_processing_project_spark.streaming import pipeline

    d = tmp_path / "mini_emb"
    d.mkdir()
    src = pq.read_table(f"{SF}/embeddings.parquet")
    pq.write_table(src.slice(0, 20), str(d / "embeddings.parquet"))

    before = _spe_tmp_dirs()
    out = pipeline.run_to_completion(
        pipeline.file_embedding_stream(spark, str(d)).selectExpr(
            "vec_id", "label"
        ),
        sink="parquet",
    )
    leaked = _spe_tmp_dirs() - before
    assert leaked == set(), f"stranded tmp dirs: {sorted(leaked)}"
    # rows must be readable AFTER the staging files are gone
    assert out.count() == 20


def test_memory_sink_cleans_checkpoint(spark, tmp_path):
    """The memory-sink path strands its checkpoint dir too — same
    hygiene pin for the default transport."""
    import pyarrow.parquet as pq

    from stream_processing_project_spark.streaming import pipeline

    d = tmp_path / "mini_emb_mem"
    d.mkdir()
    src = pq.read_table(f"{SF}/embeddings.parquet")
    pq.write_table(src.slice(0, 5), str(d / "embeddings.parquet"))

    before = _spe_tmp_dirs()
    out = pipeline.run_to_completion(
        pipeline.file_embedding_stream(spark, str(d)).selectExpr("vec_id")
    )
    assert _spe_tmp_dirs() - before == set()
    assert out.count() == 5


def test_parquet_sink_empty_batch_returns_empty(spark, tmp_path):
    """A source whose one file holds 0 rows commits an empty batch:
    the read-back must return 0 rows with the result schema (and not
    trip the no-batch guard or swallow anything)."""
    import pyarrow.parquet as pq

    from stream_processing_project_spark.streaming import pipeline

    d = tmp_path / "zero_emb"
    d.mkdir()
    src = pq.read_table(f"{SF}/embeddings.parquet")
    pq.write_table(src.slice(0, 0), str(d / "embeddings.parquet"))

    out = pipeline.run_to_completion(
        pipeline.file_embedding_stream(spark, str(d)).selectExpr(
            "vec_id", "label"
        ),
        sink="parquet",
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_id", "label"]


def test_auto_band_bits_dial():
    """VERDICT r10 task 3: band length derives from corpus size —
    ceil(log2 n) clamped to the measured recall window [12, 16]."""
    from stream_processing_project_spark.operators.similarity import (
        auto_band_bits,
    )

    assert auto_band_bits(0) == 12 and auto_band_bits(1) == 12
    assert auto_band_bits(500) == 12  # the sf0.01 gate corpus
    assert auto_band_bits(2000) == 12  # sf0.1
    assert auto_band_bits(20_000) == 15  # sf1 (10x curve corpus)
    assert auto_band_bits(200_000) == 16  # sf10 — the measured point
    assert auto_band_bits(10**9) == 16  # cap: grow tables, not bands
    vals = [auto_band_bits(n) for n in (2**k for k in range(1, 25))]
    assert vals == sorted(vals), "dial must be monotone in n"


def test_registered_banded_screen_geometry_matches_oracle():
    """The registered streaming_embedding_neardup_banded passes
    bits=None; its DuckDB oracle replays bits=_BND_BITS. They only
    agree because the dial resolves to _BND_BITS at the driver-gate
    corpus — pin that, so a fixture regeneration that grows the corpus
    past 2^12 vectors fails HERE and not as a silent hash mismatch."""
    import pyarrow.parquet as pq

    from stream_processing_project_spark.operators.similarity import (
        auto_band_bits,
    )
    from stream_processing_project_spark.plans.streaming_queries import (
        _BND_BITS,
    )

    n = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert auto_band_bits(n) == _BND_BITS


def test_banded_screen_auto_equals_explicit(spark):
    """bits=None must be a pure dial: on the fixture corpus the auto
    path and the explicit bits=12 call return identical pairs (and
    n_static short-circuits the count without changing anything)."""
    from stream_processing_project_spark.operators.similarity import (
        _quantize_expr,
        banded_neardup_screen,
    )
    from stream_processing_project_spark.plans.streaming_queries import (
        _BND_DIM,
        _BND_IDOFF,
        _BND_MOD,
        _BND_NOISE_CASE,
        _BND_T,
        _BND_TABLES,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    static = emb.selectExpr(
        "vec_id AS id_a", f"{_quantize_expr('embedding', _BND_DIM)} AS qqa"
    )
    arriv = (
        emb.filter(F.expr(f"vec_id % {_BND_MOD} = 0"))
        .selectExpr(
            "vec_id", f"{_quantize_expr('embedding', _BND_DIM)} AS qq0"
        )
        .selectExpr(
            f"vec_id + {_BND_IDOFF} AS id_b",
            f"transform(sequence(1, {_BND_DIM}),"
            f" d -> element_at(qq0, d) + {_BND_NOISE_CASE}) AS qqb",
        )
    )
    explicit = sorted(
        tuple(r)
        for r in banded_neardup_screen(
            static, arriv, bits=12, tables=_BND_TABLES, threshold=_BND_T
        ).collect()
    )
    auto = sorted(
        tuple(r)
        for r in banded_neardup_screen(
            static, arriv, bits=None, tables=_BND_TABLES, threshold=_BND_T
        ).collect()
    )
    hinted = sorted(
        tuple(r)
        for r in banded_neardup_screen(
            static,
            arriv,
            bits=None,
            tables=_BND_TABLES,
            threshold=_BND_T,
            n_static=500,
        ).collect()
    )
    assert explicit == auto == hinted
    assert len(explicit) > 0


def test_nn_graph_cache_unpersists_on_evict(spark):
    """VERDICT r10 task 4: evicting an entry from the NN-graph cache
    must free its localCheckpoint blocks immediately (deterministic
    eviction), not wait for ContextCleaner GC. Fill the cache past
    _NN_GRAPH_CACHE_PER_APP with tiny variant builds and assert the
    persistent-RDD census never grows past the cap's worth."""
    from stream_processing_project_spark.plans import extensions as ext

    def ckpt_rdd_id(df) -> int:
        return df._jdf.queryExecution().analyzed().rdd().id()

    def is_persisted(rdd_id: int) -> bool:
        return bool(
            spark.sparkContext._jsc.sc().getPersistentRDDs().contains(rdd_id)
        )

    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("vec_id") < 40)
        .localCheckpoint(eager=True)
    )
    saved = dict(ext._NN_GRAPH_CACHE)
    ext._NN_GRAPH_CACHE.clear()
    try:
        cap = ext._NN_GRAPH_CACHE_PER_APP
        ids = []
        for i in range(cap + 2):
            g = ext._nn_graph_shared(
                spark, SF, variant=f"evict-test-{i}", source=emb
            )
            g.count()  # materialize the checkpoint blocks
            ids.append(ckpt_rdd_id(g))
        # inserts cap+1 and cap+2 evicted the two oldest — their
        # checkpoint RDDs must be gone from the persistent map NOW
        # (deterministic), while every retained entry is still pinned
        assert not is_persisted(ids[0]), "evicted entry 0 still persisted"
        assert not is_persisted(ids[1]), "evicted entry 1 still persisted"
        for rid in ids[2:]:
            assert is_persisted(rid), f"retained entry {rid} lost its blocks"
        assert (
            len([k for k in ext._NN_GRAPH_CACHE if k[0] == spark.sparkContext.applicationId])
            == cap
        )
    finally:
        for k in list(ext._NN_GRAPH_CACHE):
            try:
                ext._NN_GRAPH_CACHE[k]._jdf.queryExecution().analyzed().rdd().unpersist(False)
            except Exception:
                pass
        ext._NN_GRAPH_CACHE.clear()
        ext._NN_GRAPH_CACHE.update(saved)
        emb._jdf.queryExecution().analyzed().rdd().unpersist(False)


def test_paired_test_is_nonvacuous(spark):
    """VERDICT r10 task 5: the paired test must compare two rankers
    that genuinely differ per query on the fixture (Σd² > 0 — a
    passthrough of one ranker scored twice cannot pass), over the full
    eval panel, and its fixture conclusion is the meaningful one:
    int8 quantization does NOT significantly hurt nDCG (|t| < 2)."""
    rows = get("retrieval_eval_paired_test").builder(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_queries"] == 25  # id % 20 = 0, id < 10000 on n=500
    assert r["sumsq_delta_micro"] > 0, "rankers never disagreed — vacuous"
    assert 0 < r["sum_ndcg_exact_micro"] <= r["n_queries"] * 1_000_000
    assert 0 < r["sum_ndcg_quant_micro"] <= r["n_queries"] * 1_000_000
    assert abs(r["t_stat"]) < 2.0 and not r["exact_sig_better"]


def test_lr_apply_oracle_empty_train_parity(spark, duck, tmp_path):
    """ADVICE r10: on a corpus whose doc_ids are ALL ≡ 4 (mod 5) the
    train split is empty — the Spark side returns an empty frame and
    the DuckDB oracle must now agree (it used to emit NULL-weight
    y_pred=0 confusion rows)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF}/documents.parquet")
    mask = pa.array(
        [v.as_py() % 5 == 4 for v in src.column("doc_id")]
    )
    only_test = src.filter(mask)
    assert only_test.num_rows > 0, "fixture must exercise the test split"
    d = tmp_path / "docs_test_only"
    d.mkdir()
    pq.write_table(only_test, str(d / "documents.parquet"))

    q = get("text_classifier_apply_lr")
    assert q.builder(spark, str(d)).count() == 0
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    try:
        assert duck.execute(q.oracle).fetchall() == []
    finally:
        duck.execute("DROP VIEW IF EXISTS documents")


def _drive_bucketed(spark, rows, base_dir, src_dir, n_buckets=8):
    """Feed `rows` (list of per-batch row-lists) through the bucketed
    upsert sink one micro-batch per file, return the manifest
    snapshots."""
    from stream_processing_project_spark.streaming.sinks import (
        upsert_materialized_view_bucketed,
    )

    schema = "id long, user_id long, __op string, __ts_ms long"
    for i, batch in enumerate(rows):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src_dir}/b{i}")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src_dir}/b*")
    )
    q, snaps = upsert_materialized_view_bucketed(
        stream, base_dir, n_buckets=n_buckets
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return snaps


def test_bucketed_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """VERDICT r10 perf watch-item made code: a batch whose keys land in
    a strict subset of buckets must leave every other bucket's manifest
    entry pointing at the OLD version path (zero rewrite), and the new
    version dir on disk must contain ONLY the touched buckets."""
    from pyspark.sql import functions as F2

    n_buckets = 8
    # batch 0: keys 0..63 (all buckets); batch 1: one single key
    b0 = [(k, k, "c", 1000) for k in range(64)]
    b1 = [(7, 7, "u", 2000)]
    snaps = _drive_bucketed(
        spark, [b0, b1], str(tmp_path / "state"), str(tmp_path / "src"),
        n_buckets,
    )
    assert len(snaps) == 2
    hot = (
        spark.createDataFrame([(7,)], "id long")
        .select(F2.pmod(F2.xxhash64("id"), F2.lit(n_buckets)).cast("int"))
        .first()[0]
    )
    m0, m1 = snaps
    assert m1[hot] != m0[hot] and "/v1/" in m1[hot]
    for b in range(n_buckets):
        if b != hot:
            assert m1[b] == m0[b] and "/v0/" in m1[b]
    on_disk = sorted(
        os.path.basename(p)
        for p in glob.glob(str(tmp_path / "state" / "v1" / "bkt=*"))
    )
    assert on_disk == [f"bkt={hot}"], "v1 wrote an untouched bucket"


def test_bucketed_upsert_tombstone_blocks_old_insert(spark, tmp_path):
    """A key's whole history hashes to one bucket, so tombstone
    retention must survive bucketing: delete at ts=3000, then an
    out-of-order OLDER insert (ts=2500) in a later batch — the key
    stays dead."""
    from stream_processing_project_spark.streaming.sinks import (
        read_bucketed_state,
    )

    b0 = [(1, 1, "c", 1000), (2, 2, "c", 1000)]
    b1 = [(1, 1, "d", 3000)]
    b2 = [(1, 1, "u", 2500)]  # late arrival, older than the tombstone
    snaps = _drive_bucketed(
        spark, [b0, b1, b2], str(tmp_path / "state"), str(tmp_path / "src")
    )
    final = read_bucketed_state(spark, snaps[-1])
    live = {r["id"] for r in final.filter(F.col("__op") != "d").collect()}
    assert live == {2}, "tombstoned key resurrected by an older insert"


def test_bucketed_equals_unbucketed_on_fixture(spark):
    """streaming_upsert_bucketed must produce the exact row set of
    streaming_upsert_materialize on the sf0.01 change log (same oracle
    by construction — this pins the two ENGINE paths against each
    other, bucket count and chunking notwithstanding)."""
    a = {
        tuple(r)
        for r in get("streaming_upsert_bucketed").builder(spark, SF).collect()
    }
    b = {
        tuple(r)
        for r in get("streaming_upsert_materialize")
        .builder(spark, SF)
        .collect()
    }
    assert a == b and len(a) > 0


def test_did_readout_identities(spark):
    """experiment_did (r11): the delta-based DiD estimate must equal the
    four-cell-mean formula (mathematical identity — the deltas are exact
    bigint sums), the placebo must be built from the pre-period only
    (cells reported so both engines agree on them), and both arms must
    be populated by the md5 split."""
    rows = get("experiment_did").builder(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_control"] > 0 and r["n_treat"] > 0
    cell_did = (r["post_treat"] - r["pre_treat"]) - (
        r["post_control"] - r["pre_control"]
    )
    assert abs(r["did"] - cell_did) < 1e-6 * max(1.0, abs(cell_did))
    # the fixture has no treatment (arms are a hash split of the same
    # traffic), so neither the DiD nor the placebo may read as a large
    # effect — and the placebo existing at all is the pre-trend check
    assert abs(r["t_stat"]) < 4.0
    assert abs(r["placebo_t"]) < 4.0


def test_unimax_waterfill_invariants(spark):
    """sampling_unimax_epochs (r11): the closed-form waterfill must
    (a) exercise BOTH branches on the fixture (some domains capped at
    2 epochs, some on the water level), (b) spend exactly the budget
    (19/10 of the corpus) when any domain is uncapped, (c) give every
    uncapped domain the SAME token allocation, and (d) never allocate
    above a domain's 2-epoch capacity."""
    rows = get("sampling_unimax_epochs").builder(spark, SF).collect()
    assert len(rows) == 20
    capped = [r for r in rows if r["is_capped"] == 1]
    water = [r for r in rows if r["is_capped"] == 0]
    assert capped and water, "fixture must exercise both branches"
    for r in capped:
        assert r["alloc_tokens"] == float(r["cap_tokens"])
        assert r["epochs"] == 2.0
    levels = {r["alloc_tokens"] for r in water}
    assert len(levels) == 1, f"uncapped domains got unequal shares: {levels}"
    for r in water:
        assert r["alloc_tokens"] <= r["cap_tokens"] + 1e-6
        assert r["epochs"] < 2.0
    total = sum(r["n_tokens"] for r in rows)
    budget = (total * 19) // 10
    spent = sum(r["alloc_tokens"] for r in rows)
    assert abs(spent - budget) < 1e-6 * budget


def test_ccnet_buckets_are_thirds_and_ordered(spark):
    """text_ccnet_buckets (r11): per language the three buckets must be
    thirds (sizes differ by at most 1), keep = head ∪ middle, and the
    buckets must be ordered by average surprisal (max(head) ≤
    min(middle) ≤ min(tail) per language)."""
    from collections import defaultdict

    rows = get("text_ccnet_buckets").builder(spark, SF).collect()
    assert len(rows) == 500
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r)
    assert len(by_lang) > 1
    for lang, rs in by_lang.items():
        sizes = defaultdict(int)
        for r in rs:
            sizes[r["ppl_bucket"]] += 1
            assert r["ccnet_keep"] == (0 if r["ppl_bucket"] == "tail" else 1)
        assert set(sizes) == {"head", "middle", "tail"}, (lang, dict(sizes))
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        avg = lambda r: r["surprisal_sum"] / r["n_tokens"]
        assert max(avg(r) for r in rs if r["ppl_bucket"] == "head") <= min(
            avg(r) for r in rs if r["ppl_bucket"] == "middle"
        )
        assert max(avg(r) for r in rs if r["ppl_bucket"] == "middle") <= min(
            avg(r) for r in rs if r["ppl_bucket"] == "tail"
        )


def test_r11_registrations_plan_shapes(spark):
    """No CartesianProduct anywhere in the r11 registrations, and the
    only nested-loop join each may carry is the documented 1-row
    broadcast attach (arm cells / corpus totals) — the repo-wide
    crossJoin(broadcast(1-row-agg)) pattern."""
    for name, max_bnlj in (
        ("retrieval_eval_paired_test", 2),
        ("experiment_did", 1),
        ("sampling_unimax_epochs", 1),
        ("text_ccnet_buckets", 1),
    ):
        # the simple (non-formatted) string lists each operator once,
        # so counts are per-occurrence, not tree + details
        plan = (
            get(name)
            .builder(spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan, name
        assert plan.count("BroadcastNestedLoopJoin") <= max_bnlj, name


def test_bm25_postings_materialized_once(spark):
    """r11 retrieval-family fix: the (doc_id, term) postings table used
    to be re-derived per consumer (df/qterms branch + scoring branch =
    two full token explode+shuffle passes; zero ReusedExchange). With
    the localCheckpoint the executed plan must tokenize the corpus at
    most twice in total: once to build the postings checkpoint, once
    for the corpus-stats scan."""
    df = get("retrieval_bm25_topk").builder(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") <= 2, plan.count("FileScan")
    assert "ExistingRDD" in plan  # consumers read the checkpointed RDD
