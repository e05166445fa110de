"""Physical-plan regression pins (PLANS.md invariants): column pruning,
predicate pushdown, partial aggregation, top-k without global sort, and
no driver-side broadcast of fact-sized subtrees. These are the
properties that decide 100 TB behavior — a future edit that silently
loses one should fail here, not in production."""

from __future__ import annotations

import io
import re
import contextlib

import pytest

from stream_processing_project_spark.plans.registry import all_queries
from tests.conftest import SF_SMOKE


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def read_schemas(plan: str) -> list[str]:
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in plan.splitlines()
        if "ReadSchema:" in line
    ]


def test_pricing_summary_partial_agg_and_pushdown(spark):
    plan = formatted_plan(
        all_queries()["olap_pricing_summary"].builder(spark, SF_SMOKE)
    )
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # map-side combine: a partial HashAggregate exists below the exchange
    assert plan.count("HashAggregate") >= 2
    assert "hashpartitioning(l_returnflag" in plan
    # column pruning: the 16-column lineitem scan reads only 7
    assert all(s.count(",") <= 6 for s in read_schemas(plan)), read_schemas(plan)


def test_topk_uses_take_ordered_not_full_sort(spark):
    for name in ["olap_top_brands", "olap_shipping_priority"]:
        plan = formatted_plan(all_queries()[name].builder(spark, SF_SMOKE))
        assert "TakeOrderedAndProject" in plan, name


def test_fact_joins_have_no_driver_side_subtree_broadcast(spark):
    """Q3/Q5: broadcast hints may appear only on always-tiny dims
    (nation/region) — never on a JOINED subtree (which would execute and
    collect through the driver). We assert the logical plan contains no
    ResolvedHint above a Join node."""
    for name in ["olap_shipping_priority", "olap_region_revenue"]:
        df = all_queries()[name].builder(spark, SF_SMOKE)
        logical = df._jdf.queryExecution().analyzed().toString()
        for m in re.finditer(r"ResolvedHint.*\n((?:.|\n)*?)(?=ResolvedHint|\Z)", logical):
            hinted_block_head = m.group(1).lstrip().splitlines()[0] if m.group(1).strip() else ""
            assert not hinted_block_head.lstrip("+-: ").startswith("Join"), (
                f"{name}: broadcast hint wraps a Join subtree"
            )


def test_dimension_scans_prune_columns(spark):
    plan = formatted_plan(all_queries()["dim_scan"].builder(spark, SF_SMOKE))
    schemas = read_schemas(plan)
    assert schemas and all("c_name" not in s and "c_phone" not in s for s in schemas)
    assert "PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal,0.0)]" in plan


def test_enrichment_join_is_broadcast(spark):
    """J1: the dimension side of the flagship enrichment must broadcast —
    the fact side never shuffles before the window agg."""
    plan = formatted_plan(
        all_queries()["flagship_topk_engagement"].builder(spark, SF_SMOKE)
    )
    assert "BroadcastHashJoin" in plan
    # exactly one data exchange: the window-agg hashpartitioning
    data_exchanges = [
        line for line in plan.splitlines()
        if "hashpartitioning(" in line
    ]
    assert len(data_exchanges) <= 2, plan  # agg + (optional) rollup re-agg


def test_custom_operators_avoid_nested_loop_joins(spark):
    """The composed custom operators must never degrade to
    BroadcastNestedLoopJoin/Cartesian: the range join is an equi-join on
    its bucket id, the as-of join is a union + window (no join at all in
    the carry), the cascade and gap-fill are agg/equi-join shapes."""
    for name in [
        "olap_asof_last_order",
        "olap_range_join_price_bands",
        "olap_rollup_cascade",
        "olap_gap_fill_hourly",
        # r02: blocked/bucketed similarity shapes — candidates must come
        # from equi-joins on band/cluster codes, never an all-pairs loop
        "dedup_embedding_cosine",
        "dedup_semantic_keep",
        "similarity_ann_lsh_oracled",
        "similarity_ann_ivf_oracled",
        # r07: prefix-filtered exact Jaccard — candidates must come from
        # the prefix-shingle equi-join, never an all-pairs loop
        "dedup_jaccard_prefix",
    ]:
        plan = formatted_plan(all_queries()[name].builder(spark, SF_SMOKE))
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "Cartesian" not in plan, name
    # r03: PAA pair search reworked from all-pairs broadcast to a
    # grid-bucketed (band, cell) equi-join candidate step. The builder
    # returns its verification collect as a local frame, so pin the
    # invariant on the captured plan of the grid pass that actually ran.
    from stream_processing_project_spark.plans import governance

    all_queries()["timeseries_paa_similarity"].builder(spark, SF_SMOKE)
    grid_plan = governance._LAST_PAA_GRID_PLAN
    assert grid_plan is not None
    assert "BroadcastNestedLoopJoin" not in grid_plan
    assert "CartesianProduct" not in grid_plan


def test_fan_out_is_conditional(spark):
    """fan_out_if_narrow widens a narrow source to defaultParallelism but
    must be a strict NO-OP (no added exchange) when the source already
    has enough splits — a wide 100 TB scan never pays a gratuitous
    shuffle."""
    from stream_processing_project_spark.sources.fixtures import fan_out_if_narrow

    narrow = spark.range(0, 1000, 1, 1)
    wide = spark.range(0, 1000, 1, 64)
    target = spark.sparkContext.defaultParallelism
    assert fan_out_if_narrow(narrow).rdd.getNumPartitions() == target
    assert fan_out_if_narrow(wide) is wide  # identical plan object, no-op


def test_text_narrow_ops_have_no_exchange(spark):
    """Chunking and repetition scoring are single-pass corpus transforms —
    any Exchange in their plans means a 100 TB scan started shuffling."""
    for name in ["text_chunk", "text_repetition", "text_quality"]:
        plan = formatted_plan(all_queries()[name].builder(spark, SF_SMOKE))
        assert "Exchange" not in plan, f"{name} shuffles:\n{plan}"


def test_corpus_pipeline_single_scan_single_shuffle(spark):
    """The corpus-build composition must read documents ONCE (quality +
    fingerprint fused into the scan projection) and shuffle ONCE (the
    dedup window on slim rows, text already dropped) — the whole point
    of composing the stages instead of chaining the standalone queries.
    A second ReadSchema or Exchange means a 100 TB corpus gets re-read."""
    plan = formatted_plan(
        all_queries()["corpus_build_pipeline"].builder(spark, SF_SMOKE)
    )
    assert len(read_schemas(plan)) == 1, plan
    # formatted output mentions each operator twice (tree + details):
    # count the numbered detail headers, one per physical Exchange
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    # and the one scan must not carry text into the shuffle:
    assert "text" not in read_schemas(plan)[0] or "n_tokens" in plan


def test_governance_ops_scan_shapes(spark):
    """Profile: one pruned scan (only profiled columns). Redaction: pure
    narrow map, zero exchanges. Linkage: hash join on the block key,
    never a nested loop."""
    qs = all_queries()
    prof = formatted_plan(qs["profile_events_columns"].builder(spark, SF_SMOKE))
    assert len(read_schemas(prof)) == 1
    assert "ts" not in read_schemas(prof)[0]  # unprofiled cols pruned
    red = formatted_plan(qs["text_redact_pii"].builder(spark, SF_SMOKE))
    assert "Exchange" not in red
    link = formatted_plan(qs["linkage_fuzzy_parts"].builder(spark, SF_SMOKE))
    assert "BroadcastNestedLoop" not in link and "CartesianProduct" not in link


def test_runtime_bloom_filter_injected_on_selective_fact_join(spark):
    """Catalyst's runtime bloom filter: a selective dimension-side
    predicate materializes a bloom_filter_agg subquery that pre-filters
    the FACT scan (`might_contain` on the join key) before the shuffle
    — at 100 TB this is the difference between shuffling the whole
    lineitem table and shuffling only rows that can possibly join. The
    session enables the feature (on by default); thresholds are lowered
    here only because the fixture is tiny."""
    from pyspark.sql import functions as F

    from stream_processing_project_spark.sources.fixtures import load_table

    tweaks = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in tweaks}
    try:
        for k, v in tweaks.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF_SMOKE, "lineitem")
        o = load_table(spark, SF_SMOKE, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = formatted_plan(j)
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
        # the filter must sit on the fact (lineitem) scan's condition
        fact_cond = [
            l for l in plan.splitlines()
            if "might_contain" in l and "l_orderkey" in l
        ]
        assert fact_cond, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_sampling_order_ops_shuffle_once_on_their_partition_key(spark):
    """Per-domain cap and shard shuffle are one exchange each (domain /
    shard key) — never a global single-partition sort (the scale trap
    for ordering ops: Window.orderBy() without partitionBy)."""
    for name, key in [
        ("sampling_domain_cap", "source"),
        ("sampling_shard_shuffle", "shard"),
    ]:
        plan = formatted_plan(all_queries()[name].builder(spark, SF_SMOKE))
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, f"{name}\n{plan}"
        assert f"hashpartitioning({key}" in plan, f"{name}\n{plan}"
        assert "SinglePartition" not in plan, f"{name} global sort:\n{plan}"


def test_epoch_materialize_fact_side_never_shuffles(spark):
    """Mixture materialization: the only exchanges aggregate the tiny
    per-language plan; the corpus side is scan → broadcast-join →
    explode (narrow). Any hashpartitioning on doc_id means the 100 TB
    fact table started shuffling."""
    plan = formatted_plan(
        all_queries()["sampling_epoch_materialize"].builder(spark, SF_SMOKE)
    )
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(doc_id" not in plan, plan
    assert re.search(r"\(\d+\) Generate", plan), plan  # the explode is present


def test_pq_adc_pass_joins_codes_not_vectors(spark):
    """PQ's corpus-wide scoring join must be a broadcast HASH join on
    (subspace, code) — the only nested-loop allowed is the bounded
    codebook cross-join that builds the per-query LUT (≤ m·2^bits rows
    broadcast)."""
    for name in ["similarity_ann_pq", "similarity_ann_pq_rerank"]:
        plan = formatted_plan(all_queries()[name].builder(spark, SF_SMOKE))
        assert "BroadcastHashJoin" in plan, name
        # formatted output names each node twice (tree + detail) — count
        # physical nodes by their "(id) Operator" detail headers
        nlj_nodes = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
        assert len(nlj_nodes) <= 1, (name, nlj_nodes)
        assert "Cartesian" not in plan, name


def test_sketch_ops_collapse_before_windows(spark):
    """Histogram-sketch ops must aggregate the raw scan down to the
    bin table (partial aggregation → one exchange) before any window
    or join runs; their scans must prune to the consumed columns."""
    for name, cols in [
        ("profile_histogram_quantiles", {"event_type", "value"}),
        ("profile_drift_psi", {"event_type", "value", "ts"}),
    ]:
        df = all_queries()[name].builder(spark, SF_SMOKE)
        plan = formatted_plan(df)
        assert "Cartesian" not in plan, name
        for schema in read_schemas(plan):
            got = {
                f.split(":")[0]
                for f in schema.strip("struct<>").split(",")
                if f.split(":")[0]
            }
            assert got <= cols, (name, got)


def test_retrieval_postings_prune_through_broadcast_term_list(spark):
    """BM25's scoring stage must reach postings through a broadcast HASH
    join on the term list (posting-list pruning — the whole point of the
    query shape at scale) and take its top-k with a heap, not a global
    sort. The only nested-loop joins allowed are broadcast single-row /
    query-row builds (corpus stats; the dense leg's broadcast queries)."""
    plan = formatted_plan(
        all_queries()["retrieval_bm25_topk"].builder(spark, SF_SMOKE)
    )
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    nlj = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
    assert len(nlj) <= 1, nlj  # the broadcast scalar-stats join only
    assert "Cartesian" not in plan

    plan = formatted_plan(
        all_queries()["retrieval_hybrid_rrf"].builder(spark, SF_SMOKE)
    )
    assert "BroadcastHashJoin" in plan
    nlj = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
    assert len(nlj) <= 2, nlj  # scalar stats + the dense leg's queries
    assert "Cartesian" not in plan


def test_weighted_reservoir_is_heap_topk_no_exchange(spark):
    """Priority sampling plans as TakeOrderedAndProject over a pruned
    2-column scan — no Exchange, no global Sort (the per-partition
    heap + driver merge shape that scales to any corpus)."""
    plan = formatted_plan(
        all_queries()["sampling_weighted_reservoir"].builder(spark, SF_SMOKE)
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert all("doc_id" in s and "n_chars" in s and "text" not in s
               for s in read_schemas(plan))


def test_boilerplate_strip_broadcasts_the_boiler_set(spark):
    """The per-source boilerplate set joins back onto the corpus as a
    broadcast hash join — the corpus side never shuffles for the join
    (its only exchanges feed the two small aggregates)."""
    plan = formatted_plan(
        all_queries()["text_boilerplate_strip"].builder(spark, SF_SMOKE)
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cms_estimate_broadcasts_sketch_and_partial_aggregates(spark):
    """Point queries probe the d×w counter table via a broadcast join;
    both the sketch build and the exact audit partial-aggregate
    map-side."""
    plan = formatted_plan(
        all_queries()["profile_heavy_hitters_cms"].builder(spark, SF_SMOKE)
    )
    assert "BroadcastHashJoin" in plan
    assert "partial_min" in plan and "partial_count" in plan


def test_mv_refresh_prunes_partitions_and_merges_partials(spark):
    """Incremental MV maintenance: both the base and the delta branch
    push their o_orderdate cut into the scan (at 100 TB this is the
    partition-pruning that makes the refresh |delta|-sized), the scan
    reads only the 3 needed columns, and every aggregate has a map-side
    partial below its exchange."""
    plan = formatted_plan(
        all_queries()["olap_mv_incremental_refresh"].builder(spark, SF_SMOKE)
    )
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert all(s.count(",") <= 2 for s in read_schemas(plan)), read_schemas(plan)
    assert plan.count("HashAggregate") >= 6  # partial+final × (base, delta, merge)


def test_triangle_count_joins_are_equi_not_cartesian(spark):
    """Wedge enumeration and closure run as equi-joins on node ids
    (hash-partitionable at any scale); the only nested-loop joins are
    the 1-row aggregate merges. Lineitem scans read exactly
    (l_orderkey, l_partkey)."""
    plan = formatted_plan(
        all_queries()["olap_triangle_count"].builder(spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in plan
    for s in read_schemas(plan):
        assert "l_orderkey" in s and "l_partkey" in s and s.count(",") == 1, s


def test_bloom_semijoin_probe_side_never_shuffles(spark):
    """The bloom position set reaches the probe as ONE broadcast row,
    the exact-truth check is a broadcast left join, and the fact table's
    only exchange is the final partial-aggregated groupBy — no
    SortMergeJoin anywhere, orders scan pruned to 2 columns."""
    plan = formatted_plan(
        all_queries()["olap_bloom_semijoin"].builder(spark, SF_SMOKE)
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert any(
        "o_custkey" in s and "o_orderpriority" in s and s.count(",") == 1
        for s in read_schemas(plan)
    ), read_schemas(plan)


def test_repeated_spans_marking_join_broadcasts_dup_set(spark):
    """The duplicated-gram set (HAVING >= 2 side) broadcasts onto the
    gram stream; the reinstating doc join reads doc_id only from the
    second documents scan (column pruning through the left join)."""
    plan = formatted_plan(
        all_queries()["dedup_repeated_spans"].builder(spark, SF_SMOKE)
    )
    assert "BroadcastHashJoin" in plan
    assert any(s == "struct<doc_id:bigint>" for s in read_schemas(plan)), (
        read_schemas(plan)
    )


def test_aqp_estimate_prunes_and_broadcasts_audit_join(spark):
    """Both AQP branches read ≤3 pruned columns; the estimate joins the
    exact audit as a |groups|-row broadcast — never a shuffle join."""
    plan = formatted_plan(
        all_queries()["olap_aqp_sample_estimate"].builder(spark, SF_SMOKE)
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert all(s.count(",") <= 2 for s in read_schemas(plan)), read_schemas(plan)


def test_target_encode_fact_scan_never_shuffles(spark):
    """LOO target encoding: ONE exchange total (the category partial
    aggregate); the fact side reaches the broadcast join unshuffled."""
    plan = formatted_plan(
        all_queries()["features_target_encode_loo"].builder(spark, SF_SMOKE)
    )
    assert plan.count("+- Exchange") == 1, plan.count("+- Exchange")
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_correlation_is_one_partial_aggregated_pass(spark):
    """Sufficient-statistics correlation: one exchange, partial+final
    aggregate pair, 3-column pruned scan."""
    plan = formatted_plan(
        all_queries()["profile_correlation"].builder(spark, SF_SMOKE)
    )
    assert plan.count("+- Exchange") == 1
    assert plan.count("HashAggregate") >= 2  # partial below + final above
    assert all(s.count(",") == 2 for s in read_schemas(plan)), read_schemas(plan)


def test_cep_pattern_match_single_user_exchange(spark):
    """CEP sequences: the only exchange is the user_id aggregate; the
    regex pass adds no further shuffle."""
    plan = formatted_plan(
        all_queries()["olap_event_pattern_match"].builder(spark, SF_SMOKE)
    )
    assert plan.count("+- Exchange") == 1
    assert "hashpartitioning(user_id" in plan


def test_m4_downsample_single_exchange_serves_windows_and_agg(spark):
    """M4: one (series, bucket) exchange feeds both rank directions AND
    the final aggregate (grouping on the window partition keys, not the
    derived bucket string)."""
    plan = formatted_plan(
        all_queries()["timeseries_m4_downsample"].builder(spark, SF_SMOKE)
    )
    assert plan.count("+- Exchange") == 1, plan.count("+- Exchange")


def test_timeseries_gap_ops_broadcast_the_small_sides(spark):
    """Interpolation/decomposition: the hour spine bounds are a 1-row
    broadcast, the hourly table broadcasts onto the spine, and no
    sort-merge join appears anywhere."""
    for name in ["timeseries_interpolate", "timeseries_seasonal_decompose"]:
        plan = formatted_plan(all_queries()[name].builder(spark, SF_SMOKE))
        assert "SortMergeJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name


def test_kmv_theta_merges_are_broadcast_only(spark):
    """KMV/theta: sketches and 1-row merge tables move only by
    broadcast; the raw scans never sort-merge join."""
    plan = formatted_plan(
        all_queries()["profile_distinct_kmv_theta"].builder(spark, SF_SMOKE)
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_label_propagation_rounds_stay_flat(spark):
    """LPA: label lineage truncates per round — the returned plan reads
    the final checkpoint, not a replay of 4 rounds of joins over the
    parquet scans (the flat-iteration property that keeps round N's
    plan the same size as round 1's)."""
    plan = formatted_plan(
        all_queries()["olap_nation_communities"].builder(spark, SF_SMOKE)
    )
    assert "Scan parquet" not in plan  # lineage truncated at the checkpoint
    assert "Join" not in plan


def test_ewma_scatter_is_equi_join_no_nested_loop(spark):
    """EWMA: the lag scatter must stay an equi-join composition — no
    BroadcastNestedLoopJoin (the range-join trap), and the fan-out
    multiplies the hourly rollup, not raw events (the explode sits
    above the first partial aggregate)."""
    plan = formatted_plan(
        all_queries()["timeseries_ewma_smooth"].builder(spark, SF_SMOKE)
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the explode must fan out the rollup, never the raw event scan: its
    # child subtree is the rollup's final HashAggregate or (since the
    # r11 rollup pin) the checkpointed rollup's RDD scan. ADVICE r11:
    # the former 2-line window with a bare 'Filter' escape would have
    # passed a Generate / Filter / ColumnarToRow / Scan parquet
    # regression — require the real fan-out child within the window and
    # forbid a parquet scan anywhere under it.
    tree = plan.split("(1) Scan")[0].splitlines()
    gen_rows = [i for i, ln in enumerate(tree) if "Generate" in ln]
    assert gen_rows, plan
    below = "\n".join(tree[gen_rows[0] + 1 : gen_rows[0] + 7])
    assert (
        "HashAggregate" in below or "ExistingRDD" in below
    ), tree[gen_rows[0] : gen_rows[0] + 7]
    assert "Scan parquet" not in below, below


def test_mad_anomaly_reuses_rollup_and_broadcasts_stats(spark):
    """MAD flagging: the two |series|-row percentile tables broadcast
    back; no SortMergeJoin anywhere (the fact rollup never re-shuffles
    for the stats joins)."""
    plan = formatted_plan(
        all_queries()["timeseries_anomaly_mad"].builder(spark, SF_SMOKE)
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_standard_scale_fact_never_shuffles(spark):
    """Feature scaling: one exchange total (the per-group stats partial
    aggregate); the fact rows reach the stats join via broadcast."""
    plan = formatted_plan(
        all_queries()["features_standard_scale"].builder(spark, SF_SMOKE)
    )
    assert plan.count("+- Exchange") == 1, plan.count("+- Exchange")
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_mutual_info_contingency_is_partial_aggregated(spark):
    """MI ranking: the unpivoted stream partial-aggregates below its
    exchange (map-side combine collapses each partition to distinct
    cells); marginal/total joins are broadcast-only."""
    plan = formatted_plan(
        all_queries()["features_mutual_info_rank"].builder(spark, SF_SMOKE)
    )
    assert plan.count("HashAggregate") >= 2
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_dp_release_is_single_aggregate_projection(spark):
    """DP count release: the mechanism adds zero shuffles on top of the
    underlying GROUP BY — one exchange, no joins."""
    plan = formatted_plan(
        all_queries()["governance_dp_count_release"].builder(spark, SF_SMOKE)
    )
    assert plan.count("+- Exchange") == 1, plan.count("+- Exchange")
    assert "Join" not in plan


def test_retention_sweep_is_broadcast_policy_single_agg(spark):
    """Retention sweep: policy and reference-time are broadcast; the
    fact stream reaches ONE partial-aggregated exchange (no
    SortMergeJoin, no extra fact shuffle)."""
    plan = formatted_plan(
        all_queries()["governance_retention_sweep"].builder(spark, SF_SMOKE)
    )
    assert "SortMergeJoin" not in plan
    assert plan.count("HashAggregate") >= 2  # map-side combine on the manifest agg


def test_compaction_plan_shuffles_rollup_not_raw_rows(spark):
    """Compaction planner: exactly two exchanges — the partial-
    aggregated (class, hour) rollup, then the per-class re-exchange
    feeding the prefix-sum window. The second carries only rollup-sized
    rows; the WRONG single-exchange alternative (repartition raw events
    by class before aggregating) would shuffle the full fact table.
    Pin: the map-side combine sits below the FIRST exchange."""
    plan = formatted_plan(
        all_queries()["maintenance_compaction_plan"].builder(spark, SF_SMOKE)
    )
    assert plan.count("+- Exchange") == 2, plan.count("+- Exchange")
    # the BOTTOM-most exchange (first executed) must sit directly above
    # a partial HashAggregate — i.e. the map-side combine happens before
    # any shuffle; a repartition-raw-first regression breaks this
    tree = plan.split("(1) Scan")[0].splitlines()
    ex_rows = [i for i, ln in enumerate(tree) if "Exchange" in ln]
    assert "HashAggregate" in tree[ex_rows[-1] + 1], tree[ex_rows[-1] : ex_rows[-1] + 2]
    assert "BroadcastNestedLoopJoin" not in plan


def test_skew_gini_windows_the_rollup_not_events(spark):
    """Gini profiler: the rank window runs over the per-key ROLLUP
    (first HashAggregate precedes the Window) and partitions by class
    — never a global unpartitioned sort of raw events."""
    plan = formatted_plan(
        all_queries()["profile_skew_gini"].builder(spark, SF_SMOKE)
    )
    # the Window's child chain (Sort → Exchange → HashAggregate) must
    # reach the per-key rollup within three lines — it ranks rollup
    # rows, never raw events
    tree = plan.split("(1) Scan")[0].splitlines()
    win_rows = [i for i, ln in enumerate(tree) if "Window" in ln]
    assert win_rows, plan
    below = "\n".join(tree[win_rows[0] + 1 : win_rows[0] + 4])
    assert "HashAggregate" in below, below
    assert "windowspecdefinition(event_type" in plan  # partitioned, not global


def test_decayed_topk_is_take_ordered_single_agg(spark):
    """Decayed leaderboard: scalar-broadcast reference time, one
    partial-aggregated exchange, TakeOrderedAndProject — no global
    sort, no SortMergeJoin."""
    plan = formatted_plan(
        all_queries()["olap_decayed_topk"].builder(spark, SF_SMOKE)
    )
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("HashAggregate") >= 2


def test_pca_scatter_is_one_partial_aggregated_pass(spark):
    """PCA: the only data-sized stage is the scatter-matrix aggregate —
    the pair fan-out comes from nested generates on the same row (no
    self-join), partial-aggregated below its exchange; no
    BroadcastNestedLoopJoin anywhere in the stats plan."""
    # pin the invariant on the PRODUCTION scatter construction (shared
    # helper — the full query's driver fold returns a local frame, so
    # the data-sized stage is exposed separately for introspection)
    from stream_processing_project_spark.plans.extensions import (
        pca_normalized_scatter,
    )

    plan = formatted_plan(pca_normalized_scatter(spark, SF_SMOKE))
    # the only nested-loop joins allowed are the Cross BuildRight
    # broadcasts of 1-row aggregates (the scalar-subquery idiom for
    # n and max|M|) — never an inner pair join. Count in the TREE
    # section (detail headers repeat the node name without its type).
    tree_txt = plan.split("(1) Scan")[0]
    assert tree_txt.count("BroadcastNestedLoopJoin") == tree_txt.count(
        "BroadcastNestedLoopJoin Cross BuildRight"
    )
    assert "SortMergeJoin" not in plan  # pair fan-out is generate-based
    assert plan.count("HashAggregate") >= 2  # map-side combine
    # only the co-moment aggregate exchanges data-sized partials; the
    # marginal/total exchanges carry <= d rows each
    tree = plan.split("(1) Scan")[0].splitlines()
    gen_rows = [i for i, ln in enumerate(tree) if "Generate" in ln]
    assert gen_rows, plan  # nested generates present (no self-join)


def test_column_masking_is_pure_projection(spark):
    """Masking view: zero exchanges, zero joins — masking costs the
    scan, nothing more."""
    plan = formatted_plan(
        all_queries()["governance_column_masking"].builder(spark, SF_SMOKE)
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_yoy_growth_window_runs_on_rollup(spark):
    """YoY: the lag window runs over the |nations x years| rollup (the
    first aggregate precedes the Window); nation joins broadcast, and
    no driver-side collect feeds the window."""
    plan = formatted_plan(all_queries()["olap_yoy_growth"].builder(spark, SF_SMOKE))
    # tree prints top-down (consumers first): the Window's child chain
    # (Sort → Exchange → HashAggregate) must reach the rollup aggregate
    # within three lines — the window consumes the rollup, not fact rows
    tree = plan.split("(1) Scan")[0].splitlines()
    win_rows = [i for i, ln in enumerate(tree) if "Window" in ln]
    assert win_rows, plan
    below = "\n".join(tree[win_rows[0] + 1 : win_rows[0] + 4])
    assert "HashAggregate" in below, below
    assert "BroadcastHashJoin" in plan


def test_spatial_grid_join_is_equi_never_cross(spark):
    """Spatial radius join: candidates come from the (cx, cy) equi-join
    — no BroadcastNestedLoopJoin/Cartesian anywhere; the 9x neighbor
    fan-out multiplies the SMALLER (supplier) side only."""
    plan = formatted_plan(
        all_queries()["olap_spatial_join_grid"].builder(spark, SF_SMOKE)
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Cartesian" not in plan
    tree = plan.split("(1) Scan")[0]
    assert "Generate" in tree  # the neighbor explode


def test_spatial_grid_join_crosses_antimeridian(spark):
    """r04: longitude wraps — cells 0 and 35 are adjacent and the lon
    delta is the torus distance, so pairs straddling the antimeridian
    ARE found. Pinned on the sf0.01 fixture, which contains 5 such
    pairs (raw |Δlon| > 180e6 yet within the 10e6 radius after wrap);
    the planar form returned zero of them."""
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    pairs = all_queries()["olap_spatial_join_grid"].builder(spark, sf)
    mdint = lambda p, c: F.conv(  # noqa: E731 — mirrors the builder
        F.substring(F.md5(F.concat(F.lit(p), c.cast("string"))), 1, 15), 16, 10
    ).cast("long")
    cust = spark.read.parquet(f"{sf}/customer.parquet").select(
        "c_custkey", (mdint("lon:", F.col("c_custkey")) % 360000000).alias("clon")
    )
    supp = spark.read.parquet(f"{sf}/supplier.parquet").select(
        "s_suppkey", (mdint("slon:", F.col("s_suppkey")) % 360000000).alias("slon")
    )
    wrap = (
        pairs.join(cust, "c_custkey")
        .join(supp, "s_suppkey")
        .filter(F.abs(F.col("slon") - F.col("clon")) > 180000000)
    )
    assert wrap.count() > 0


def test_abc_pareto_window_is_range_partitioned(spark):
    """r04: the global cumsum swap — every Window in the plan is
    partitioned by the revenue-range bucket (no single-partition
    ordered window over |parts| rows; the only SinglePartition
    exchange allowed is the 1-row total aggregate). r06 adds the two
    queries the r05 verdict flagged for the same class of defect:
    sax breakpoints and spearman ranks both cumsum over near-unique
    cent values, so their distinct tables are data-sized at scale —
    plus two found by the same sweep: the Lorenz distinct-value cumsum
    (customer-sized; its only unbucketed window is the 10-row decile
    rollup) and the zorder audit's three fact-sized total orders
    (global ntile replaced by exact NTILE arithmetic on the bucketed
    row number)."""
    for name in (
        "olap_abc_pareto",
        "olap_percent_rank_spend",
        "timeseries_sax_symbols",
        "profile_spearman_rank_corr",
        "maintenance_zorder_layout",
    ):
        df = all_queries()[name].builder(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        assert specs, (name, plan)
        for s in specs:
            # the range-bucket column leads every window spec; sax's
            # word-support count (r07) partitions by the word key —
            # key-partitioned, which is the property this pin protects
            assert s.startswith(("_rsb#", "sax_word#")) and (
                name == "timeseries_sax_symbols" or s.startswith("_rsb#")
            ), (name, s)
    # Lorenz: the data-sized cumsum must be bucketed; the one window
    # allowed off the bucket is the 10-row decile-grain share rollup
    df = all_queries()["olap_lorenz_curve_deciles"].builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    off_bucket = [s for s in specs if not s.startswith("_rsb#")]
    assert len(off_bucket) == 1 and off_bucket[0].startswith("decile#"), specs
    # Zipf: NO global window anywhere — every spec leads with a
    # partition column: the count-of-counts range bucket (_rsb), the
    # count value (salt-offset cumsum, <=256 rows per count), or the
    # (count, salt) pair (within-slice row_number)
    df = all_queries()["text_zipf_fit"].builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    for s in specs:
        assert s.startswith(("_rsb#", "c#")), specs


def test_attribution_single_user_exchange(spark):
    """Last-touch attribution: the union-and-carry as-of idiom — ONE
    user_id exchange serves the carry window; the credit aggregate is
    partial-aggregated; no joins at all in the plan."""
    plan = formatted_plan(
        all_queries()["olap_attribution_last_touch"].builder(spark, SF_SMOKE)
    )
    assert "Join" not in plan
    assert plan.count("hashpartitioning(user_id") >= 1
    assert plan.count("HashAggregate") >= 2


def test_nn_descent_all_stages_are_equi_joins(spark):
    """NN-Descent (r07): seed bucketings, two-hop candidate expansion
    and both scoring passes must all plan as equi-joins — never
    BroadcastNestedLoopJoin/Cartesian (the all-pairs trap the algorithm
    exists to avoid). Built with checkpoint=False so the full lineage
    is visible to explain (localCheckpoint truncates it)."""
    from stream_processing_project_spark.operators.similarity import (
        nn_descent_graph,
    )

    import re

    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from stream_processing_project_spark.operators.similarity import (
        _nn_descent_round,
    )

    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet")
    # seed: the only nested-loop nodes allowed are the 1-row adaptive-B
    # count broadcasts (one per seed bucketing); every data-sized join
    # must be an equi-join on the bucket key
    seed = nn_descent_graph(emb, k=8, iters=0, checkpoint=False)
    plan = formatted_plan(seed)
    assert "Cartesian" not in plan
    nlj = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
    # two sides per bucketing self-join x three bucketings, each
    # carrying its own copy of the 1-row count broadcast
    assert len(nlj) <= 6, plan[:2000]
    # one improvement round over a materialized edge frame: pure
    # equi-joins, zero nested loops (the PAA grid-plan pin pattern —
    # the composed loop's uncheckpointed lineage replicates subtrees
    # exponentially, so the round is pinned in isolation)
    edges = seed.select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst"), "cos"
    ).localCheckpoint()
    ev = emb.selectExpr("vec_id AS id", "CAST(embedding AS array<double>) AS v")
    src_v = ev.select(F.col("id").alias("src"), F.col("v").alias("sv"))
    dst_v = ev.select(F.col("id").alias("dst"), F.col("v").alias("dv"))
    w = Window.partitionBy("src").orderBy(
        F.col("cos").desc_nulls_last(), F.col("dst")
    )
    round_plan = formatted_plan(_nn_descent_round(edges, src_v, dst_v, 8, w))
    assert "BroadcastNestedLoopJoin" not in round_plan
    assert "Cartesian" not in round_plan


def test_dsir_plans_topk_not_global_sort(spark):
    """DSIR (r07): the final Gumbel-top-100 must plan as
    TakeOrderedAndProject (heap top-k, no global sort/exchange of the
    full doc set), and the only nested-loop join allowed is the 1-row
    bucket-totals broadcast (the repo-wide scalar-denominator idiom)."""
    import re

    plan = formatted_plan(
        all_queries()["sampling_dsir_importance"].builder(spark, SF_SMOKE)
    )
    assert "TakeOrderedAndProject" in plan
    nlj = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
    assert len(nlj) <= 1  # the 64-row x 1-row totals cross join only
