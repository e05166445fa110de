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
    # r01 hard failure + the five latent TIMESTAMP_NTZ twins
    "olap_rolling_1h_avg",
    "olap_sessionize",
    "cdc_ingest",
    "cdc_upsert_materialize",
    "cdc_scd2_history",
    "cdc_parse_audit",
    # reworked this round (all-pairs join replaced by LSH blocking)
    "dedup_embedding_cosine",
    # new oracled companions for the r01 no_oracle sketches
    "dedup_minhash_containment",
    "dedup_simhash_containment",
    "text_winnow_containment",
    "similarity_ann_lsh_oracled",
    "similarity_ann_ivf_oracled",
    "dedup_semantic_keep",
    "olap_waiting_suppliers",
    "olap_important_parts",
    "olap_dominant_shippers",
    # new or reworked this session — each needs a first driver row
    "retrieval_bm25_topk",
    "retrieval_hybrid_rrf",
    "dedup_incremental_minhash",
    "similarity_ann_pq",
    "similarity_ann_pq_rerank",
    "text_intradoc_dedup",
    "olap_grouping_sets",
    "profile_histogram_quantiles",
    "profile_drift_psi",
    "olap_nation_pagerank",
    "linkage_fuzzy_parts",
    "sampling_quality_topp",
    "streaming_histogram_quantiles",
    "profile_distinct_overlap_hll",
    "text_char_entropy",
    "corpus_refine_pipeline",
    # web-curation additions (r02 cont.)
    "sampling_weighted_reservoir",
    "text_boilerplate_strip",
    "dedup_url_canonical",
    "text_quality_linear_score",
    "streaming_scd2_enrich",
    "profile_heavy_hitters_cms",
    "streaming_heavy_hitters_cms",
    "text_bpe_train",
    "text_bpe_tokenize",
    "sampling_dialogue_assemble",
    "similarity_negative_sample",
    "timeseries_paa_similarity",
    "profile_winsorize_clip",
    "olap_mv_incremental_refresh",
    "olap_triangle_count",
    "dedup_repeated_spans",
    "olap_bloom_semijoin",
    "olap_aqp_sample_estimate",
    "profile_join_skew",
    "features_target_encode_loo",
    "timeseries_m4_downsample",
    "timeseries_interpolate",
    "timeseries_seasonal_decompose",
    "profile_correlation",
    "maintenance_zorder_layout",
    "olap_event_pattern_match",
    "streaming_m4_downsample",
    "profile_distinct_kmv_theta",
    "olap_nation_communities",
    "governance_k_anonymity",
    "olap_event_transitions",
    "timeseries_time_weighted_avg",
    "olap_interval_overlap_join",
    "timeseries_changepoint_cusum",
    "streaming_event_transitions",
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
    """Names with a passing row in the newest CORRECTNESS_r{N}.json —
    these already have hard driver signal, so within each module's
    round-robin queue they yield their slot to still-unverified queries
    (matters only if the driver's correctness window truncates)."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    rounds = sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
    if not rounds:
        return set()
    try:
        with open(rounds[-1]) as f:
            rows = json.load(f)
    except (OSError, json.JSONDecodeError):
        return set()
    return {
        n
        for n, r in rows.items()
        if isinstance(r, dict) and r.get("rows_match") and r.get("hash_match")
    }


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
    for name in _PRIORITY:
        if name in _REGISTRY and name not in seen:
            ordered.append(_REGISTRY[name])
            seen.add(name)
    queues = [[q for q in qs if q.name not in seen] for qs in by_module.values()]
    while any(queues):
        for qu in queues:
            if qu:
                ordered.append(qu.pop(0))
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
