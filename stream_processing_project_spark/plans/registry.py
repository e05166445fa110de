"""Named-query registry — the engine's public query surface.

Every operator claimed in SURVEY.md §2 registers here as a named query:
a builder (spark, sf_dir) -> DataFrame plus, where SQL-expressible, the
equivalent DuckDB oracle SQL. __spark_entry__.py re-exports this registry
to the driver; bench.py runs the `bench`-tagged subset.

Column-name contract: every computed column is aliased identically in
the Spark builder and the oracle SQL (the driver sorts columns by name
before value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    builder: Builder
    oracle: str | None = None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        _REGISTRY[name] = Query(name, fn, oracle, tags, (fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def get(name: str) -> Query:
    _load()
    return _REGISTRY[name]


def queries() -> dict[str, Builder]:
    """Driver contract: name -> (spark, sf_dir) -> DataFrame."""
    return {n: q.builder for n, q in all_queries().items()}


def oracles() -> dict[str, str]:
    """Driver contract: name -> DuckDB SQL (only SQL-expressible ops)."""
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}


_LOADED = False

# The driver's CORRECTNESS gate sampled only the FIRST 50 registered
# queries in r01 (module import order meant analytics + extensions
# monopolized the window; olap/scalar_surface/governance/
# streaming_queries got zero rows — VERDICT.md "What's wrong" #3). To
# make any prefix of the registry representative, registration order is
# rewritten after load: an explicit high-risk priority list first (the
# r01-red/latent queries, so their fixes get hard driver rows), then a
# round-robin interleave across modules, previously-uncovered modules
# leading. Harmless when the gate runs all queries; decisive when it
# truncates.
_PRIORITY = [
    # r05-new oracles first (the standing ADVICE convention: every new
    # oracle gets a hard cross-engine driver row in its own round)
    "olap_bitmap_distinct_rollup",
    "multimodal_phash_neardup",
    "features_isotonic_calibration",
    "features_hashing_trick",
    "text_bigram_logprob",
    "cdc_retract_aggregate",
    "streaming_retract_aggregate",
    "timeseries_holt_brown_trend",
    "vector_random_projection_jl",
    "cdc_time_travel_read",
    "sampling_neyman_allocation",
    "experiment_welch_ttest",
    "experiment_cuped_adjust",
    "similarity_ann_recall_at_k",
    "olap_weighted_sssp",
    "maintenance_zonemap_prune",
    "text_trigram_backoff",
    "text_classifier_train_lr",
    "experiment_bootstrap_ci",
    "experiment_srm_check",
    "governance_t_closeness",
    "text_tokenizer_fertility",
    "text_zipf_fit",
    "multimodal_audio_segments",
    "timeseries_sax_symbols",
    "olap_dau_wau_stickiness",
    "experiment_msprt_monitor",
    "dedup_lsh_quality_audit",
    "vector_centroid_drift",
    "olap_pvm_decomposition",
    "governance_subject_access_report",
    "olap_survival_kaplan_meier",
    "profile_spearman_rank_corr",
    "streaming_wau_bitmap",
    "experiment_power_mde",
    "profile_join_key_discovery",
    "text_lexical_diversity",
    "olap_budget_allocation_hamilton",
    "governance_row_level_policy",
    "olap_market_concentration_hhi",
    "olap_lorenz_curve_deciles",
    "cdc_out_of_order_audit",
    "sampling_group_kfold",
    # r04 rotation: the 82 names that have never had a driver
    # correctness row (r01-r03 checked 147/229; every checked name is
    # green). New r03 operator families lead so each new oracle gets a
    # hard cross-engine row first (ADVICE r03); the tail rolls into r05.
    # Greens yield their slot automatically (_reorder), so this list
    # self-drains as rounds land.
    "olap_spatial_join_grid",
    "olap_nation_bfs_hops",
    "olap_attribution_last_touch",
    "governance_dp_count_release",
    "vector_pca_power_iteration",
    "profile_chisquare_independence",
    "sampling_preference_pairs",
    "streaming_ewma_state",
    "streaming_dedup_minhash",
    "similarity_kmeans_train",
    "similarity_ann_ivf_trained",
    "maintenance_compaction_plan",
    "streaming_decayed_topk",
    "olap_decayed_topk",
    "olap_nation_communities",
    "olap_recursive_calendar",
    "olap_skew_salted_join",
    "sampling_curriculum_anneal",
    "corpus_data_card",
    "profile_skew_gini",
    "governance_column_masking",
    "features_standard_scale",
    "timeseries_ewma_smooth",
    "timeseries_anomaly_mad",
    "streaming_m4_downsample",
    "streaming_text_chunk",
    "streaming_text_quality",
    "streaming_redact_pii",
    "streaming_event_transitions",
    "streaming_interval_join_outer",
    "streaming_distinct_users_hll",
    "text_adaptive_quality_filter",
    "text_heavy_hitters",
    "text_normalize",
    "udtf_word_bigrams",
    "vector_stats_hof",
    "similarity_matryoshka_topk",
    "similarity_quantized_topk",
    "similarity_rank_fusion",
    "sampling_domain_cap",
    "sampling_epoch_materialize",
    "sampling_shard_shuffle",
    "sampling_temperature_mix",
    "profile_distinct_kmv_theta",
    "profile_distinct_rollup_hll",
    "profile_events_columns",
    "profile_value_histogram",
    "quality_expectations",
    "recon_full_outer_activity",
    "recon_snapshot_diff",
    "governance_retention_sweep",
    "json_variant_extract",
    "features_mutual_info_rank",
    "active_customers_semi",
    "corpus_build_pipeline",
    "olap_abc_pareto",
    "olap_brand_band_revenue",
    "olap_cube_order_totals",
    "olap_distinct_quantiles",
    "olap_exists_subquery",
    "olap_filtered_revenue",
    "olap_first_last_nth",
    "olap_idle_rich_customers",
    "olap_lateral_top_orders",
    "olap_median_order_value",
    "olap_min_cost_supplier",
    "olap_nation_trade_volume",
    "olap_ntile_value_quartiles",
    "olap_part_supplier_variety",
    "olap_percent_rank_spend",
    "olap_pivot_order_status",
    "olap_product_profit",
    "olap_promo_part_suppliers",
    "olap_promo_revenue_share",
    "olap_returned_items",
    "olap_rollup_lineitem",
    "olap_shipping_priority",
    "olap_small_quantity_revenue",
    "olap_top_brands",
    "olap_top_supplier_revenue",
    "olap_unpivot",
    "olap_yoy_growth",
    # r04-new operators (basket / ACF / OLS forecast / RFM) — behind
    # the backlog above; they rotate into the window as greens drain it
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
]

# Round-robin module order: modules with zero r01 driver rows first.
_MODULE_ORDER = [
    "scalar_surface",
    "olap",
    "streaming_queries",
    "governance",
    "analytics",
    "extensions",
]


def _driver_green() -> set[str]:
    """Names whose MOST RECENT driver row passed — these already have
    hard driver signal, so they yield their window slot to
    still-unverified queries (matters only if the driver's correctness
    window truncates). Latest status wins, scanning all rounds: the
    driver samples a near-disjoint 50-query window each round, so a
    query green in r01 but absent from r02 must still yield — but a
    query that REGRESSED in a later round must lose its green and move
    back to the front of the rotation for the retry."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    latest: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for n, r in rows.items():
            if isinstance(r, dict):
                latest[n] = bool(r.get("rows_match") and r.get("hash_match"))
    return {n for n, ok in latest.items() if ok}


def _reorder() -> None:
    green = _driver_green()
    by_module: dict[str, list[Query]] = {m: [] for m in _MODULE_ORDER}
    for q in _REGISTRY.values():
        mod = q.builder.__module__.rsplit(".", 1)[-1]
        by_module.setdefault(mod, []).append(q)
    for qs in by_module.values():
        qs.sort(key=lambda q: q.name in green)  # stable: unverified first

    ordered: list[Query] = []
    seen: set[str] = set()
    # Priority names yield their front-of-window slot once they carry a
    # green driver row (any round) — otherwise a stale priority list
    # would re-consume the whole 50-query window next round and stall
    # the rotation. A priority name that FAILED its driver check stays
    # at the front for the retry.
    for name in _PRIORITY:
        if name in _REGISTRY and name not in seen and name not in green:
            ordered.append(_REGISTRY[name])
            seen.add(name)
    # Two interleave passes: every never-green query across all modules
    # first (module-interleaved for family diversity), greens only after
    # — a module that runs out of unverified names must not let its
    # green tail crowd first-time names out of the driver's 50-window.
    for keep_green in (False, True):
        queues = [
            [
                q
                for q in qs
                if q.name not in seen and (q.name in green) == keep_green
            ]
            for qs in by_module.values()
        ]
        while any(queues):
            for qu in queues:
                if qu:
                    q = qu.pop(0)
                    ordered.append(q)
                    seen.add(q.name)
    _REGISTRY.clear()
    _REGISTRY.update({q.name: q for q in ordered})


def _load() -> None:
    """Import all modules that register queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # imported for their registration side effects
    from stream_processing_project_spark.plans import (  # noqa: F401
        analytics,
        extensions,
        governance,
        olap,
        scalar_surface,
        streaming_queries,
    )

    _reorder()
    _LOADED = True
