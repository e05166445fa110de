"""Scaling-curve measurement for the LLM-pipeline query families.

Synthesizes a 10× corpus (sf≈1) from the sf0.1 fixtures into /tmp —
ids offset per replica so dedup/join semantics stay meaningful — and
times representative extension queries at sf0.01 / sf0.1 / sf1 to
check the scaling exponent empirically (a ~linear curve backs the
PLANS.md 100 TB arguments; anything super-linear is a candidate for
the smoke table's plan audit).

    python scripts/scale_curve.py            # ~10 min on local[32]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF1 = "/tmp/sfcurve2"
SRC = "/root/testdata/sf0.1"

QUERIES = [
    "dedup_exact_stats",
    "dedup_repeated_spans",
    "olap_triangle_count",
    "olap_mv_incremental_refresh",
    "olap_event_pattern_match",
    "olap_bloom_semijoin",
    "timeseries_m4_downsample",
    "timeseries_interpolate",
    "profile_join_skew",
    "profile_correlation",
    "features_target_encode_loo",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "text_winnow_candidates",
    "retrieval_bm25_topk",
    "similarity_bruteforce_topk",
    "similarity_ann_pq",
    "linkage_fuzzy_parts",
    "corpus_build_pipeline",
    "text_bpe_train",
    "dedup_url_canonical",
    "text_boilerplate_strip",
    # r03: families added or reworked in r02 (VERDICT task 8) — each
    # needs an empirical exponent behind its PLANS.md scale claim
    "olap_interval_overlap_join",
    "timeseries_changepoint_cusum",
    "olap_event_transitions",
    "timeseries_paa_similarity",
    # r03 new operators
    "similarity_kmeans_train",
    "streaming_dedup_minhash",
    # r08 additions
    "similarity_mmr_select",
    "similarity_graph_beam_search",
    # r09 additions: graph lifecycle (insert pays its own filtered-index
    # build; delete rides the session-shared graph) + rerank stage
    "similarity_graph_insert_batch",
    "similarity_graph_delete_compact",
    "retrieval_rerank_cross",
    # r03 cont.: smoothing / robust anomaly / feature prep / DP /
    # maintenance additions
    "timeseries_ewma_smooth",
    "timeseries_anomaly_mad",
    "features_standard_scale",
    "features_mutual_info_rank",
    "governance_dp_count_release",
    "governance_retention_sweep",
    "maintenance_compaction_plan",
    # r03 cont. 2: iterative PCA, curriculum, diff/reporting, decayed
    # ranking, masking, data card
    "vector_pca_power_iteration",
    "sampling_curriculum_anneal",
    "recon_snapshot_diff",
    "olap_yoy_growth",
    "olap_abc_pareto",
    "olap_decayed_topk",
    "streaming_decayed_topk",
    "profile_skew_gini",
    "governance_column_masking",
    "corpus_data_card",
    "olap_promo_part_suppliers",
    "olap_spatial_join_grid",
    "olap_nation_bfs_hops",
    "olap_attribution_last_touch",
    "sampling_preference_pairs",
    "profile_chisquare_independence",
    # r04 additions: business-analytics family
    "olap_market_basket",
    "timeseries_autocorrelation",
    "timeseries_linear_forecast",
    "olap_rfm_segments",
    "olap_attribution_markov",
    "olap_interpurchase_time",
    "olap_new_vs_returning",
    "streaming_linear_fit",
    "multimodal_decode_real",
    "features_woe_encoding",
    "profile_benford_deviation",
    "quality_freshness_volume",
    "olap_cohort_ltv",
    "olap_mv_join_delta",
    "profile_ks_drift",
    "olap_nation_kcore",
    "features_pit_join",
    "olap_skyline_2d",
    "streaming_pit_features",
    "olap_conversion_paths_topk",
    "profile_join_cardinality",
    "governance_crypto_shred",
    # r05 additions: exact-distinct bitmap rollup, calibration,
    # hashed features, bigram LM, perceptual-hash image near-dup
    "olap_bitmap_distinct_rollup",
    "features_isotonic_calibration",
    "features_hashing_trick",
    "text_bigram_logprob",
    "multimodal_phash_neardup",
    "cdc_retract_aggregate",
    "streaming_retract_aggregate",
    "timeseries_holt_brown_trend",
    "vector_random_projection_jl",
    # r10 additions: the banded near-dup twin (the scale-safe plan the
    # exact twin's docstring promised — THIS one belongs on the sf1
    # curve), cross-document substring dedup, and the re-registered
    # exact-integer GEMM ANN builds
    "streaming_embedding_neardup_banded",
    "dedup_cross_doc_spans",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "dedup_cross_doc_spans_apply",
    "retrieval_prf_rocchio",
    "streaming_decontaminate_gate",
    "similarity_ann_ivf_filtered",
    "text_classifier_apply_lr",
    "text_span_corruption",
]

# tables the query families above touch; replicated 10× with offset ids
SCALED = {
    "documents": "SELECT doc_id + {off} AS doc_id, text, lang, source, n_chars FROM t",
    "embeddings": "SELECT vec_id + {off} AS vec_id, embedding, label FROM t",
    "part": (
        "SELECT p_partkey + {off} AS p_partkey, p_name, p_brand,"
        " p_type, p_size, p_retailprice FROM t"
    ),
    # 10x traffic: same time range / customer dim, disjoint event/user,
    # order, and part id spaces per replica (models a true scale-up:
    # more series, more orders, more parts — not a denser graph)
    "events": (
        "SELECT event_id + {off} AS event_id, ts, user_id + {off} AS user_id,"
        " event_type, value, props FROM t"
    ),
    "orders": (
        "SELECT o_orderkey + {off} AS o_orderkey, o_custkey, o_orderstatus,"
        " o_totalprice, o_orderdate, o_orderpriority FROM t"
    ),
    "lineitem": (
        "SELECT l_orderkey + {off} AS l_orderkey, l_partkey + {off} AS l_partkey,"
        " l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount,"
        " l_tax, l_returnflag, l_linestatus, l_shipdate FROM t"
    ),
    # customer replicates with offset custkeys so dimension-scan queries
    # (governance_dp_count_release) measure a REAL 10x; replica 0 keeps
    # the original key range, so orders.o_custkey (unscaled refs) still
    # joins — fact-to-dim queries see the same matches as before
    "customer": (
        "SELECT c_custkey + {off} AS c_custkey, c_name, c_nationkey,"
        " c_acctbal, c_mktsegment FROM t"
    ),
}
PASSTHROUGH = ["region", "nation", "supplier"]


def build_sf1() -> None:
    os.makedirs(SF1, exist_ok=True)
    con = duckdb.connect()
    for name, sel in SCALED.items():
        out = os.path.join(SF1, f"{name}.parquet")
        if os.path.exists(out):
            continue
        con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{SRC}/{name}.parquet')")
        # id stride: next power of ten above the max id keeps replicas disjoint
        id_col = sel.split(" + ")[0].replace("SELECT ", "").strip()
        mx = con.execute(f"SELECT max({id_col}) FROM t").fetchone()[0]
        stride = 10 ** len(str(mx))
        union = " UNION ALL ".join(sel.format(off=i * stride) for i in range(10))
        con.execute(f"COPY ({union}) TO '{out}' (FORMAT PARQUET)")
        print("built", out, flush=True)
    for name in PASSTHROUGH:
        out = os.path.join(SF1, f"{name}.parquet")
        if not os.path.exists(out):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), out)


def main() -> None:
    build_sf1()
    from stream_processing_project_spark.session import get_spark
    from stream_processing_project_spark.plans.registry import all_queries

    spark = get_spark("scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    names = sys.argv[1:] or QUERIES  # optional subset: scale_curve.py q1 q2
    print(f"{'query':32s} {'sf0.01':>8s} {'sf0.1':>8s} {'sf1':>8s} {'x(0.1->1)':>10s}")
    # The NN-Descent graph is session-cached across its four consumers
    # (extensions._NN_GRAPH_CACHE, r09). For an honest BUILD curve the
    # cache must be cleared before every run of the build query — the
    # warm pass would otherwise leave the timed pass reading a
    # checkpointed RDD. Dependent consumers (beam search, outliers,
    # recall) deliberately KEEP the cache: their curve then measures
    # serving cost on a built index, the production shape.
    from stream_processing_project_spark.plans import extensions as _ext

    def _pre(name):
        if name in ("similarity_nn_descent_graph",):
            _ext._NN_GRAPH_CACHE.clear()

    for name in names:
        row = [name]
        times = []
        for sf_dir in ["/root/testdata/sf0.01", "/root/testdata/sf0.1", SF1]:
            _pre(name)
            force(qs[name].builder(spark, sf_dir))  # warm codegen
            _pre(name)
            t0 = time.perf_counter()
            force(qs[name].builder(spark, sf_dir))
            times.append(time.perf_counter() - t0)
        ratio = times[2] / times[1] if times[1] > 0 else float("nan")
        print(f"{name:32s} {times[0]:8.2f} {times[1]:8.2f} {times[2]:8.2f} {ratio:10.1f}")


if __name__ == "__main__":
    main()
