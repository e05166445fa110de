"""Independent correctness properties of the r03-continuation operators
— checks BEYOND cross-engine oracle parity (which only proves both
engines agree): completeness against brute force, convergence against
numpy, conservation laws, and structural invariants."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from stream_processing_project_spark.plans.registry import all_queries
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_spatial_grid_join_matches_brute_force(spark):
    """The 3x3 neighbor expansion is a GUARANTEE, not a heuristic: the
    grid join's pair set must equal the brute-force radius join
    exactly (cell size == radius => any pair within the radius shares
    a 3x3 neighborhood — with the r04 antimeridian wrap, 'shares'
    includes the mod-36 cell adjacency, and the brute force below uses
    the same torus lon distance)."""
    grid = all_queries()["olap_spatial_join_grid"].builder(spark, SF_ORACLE)
    got = {(r.s_suppkey, r.c_custkey, r.dist_sq) for r in grid.collect()}

    mdint = lambda prefix, col: F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix), col.cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    from stream_processing_project_spark.plans.common import t

    cust = t(spark, SF_ORACLE, "customer").select(
        "c_custkey",
        (mdint("lon:", F.col("c_custkey")) % 360000000).alias("clon"),
        (mdint("lat:", F.col("c_custkey")) % 180000000).alias("clat"),
    )
    supp = t(spark, SF_ORACLE, "supplier").select(
        "s_suppkey",
        (mdint("slon:", F.col("s_suppkey")) % 360000000).alias("slon"),
        (mdint("slat:", F.col("s_suppkey")) % 180000000).alias("slat"),
    )
    dlon = F.least(
        F.abs(F.col("slon") - F.col("clon")),
        F.lit(360000000).cast("long") - F.abs(F.col("slon") - F.col("clon")),
    )
    brute = (
        supp.crossJoin(cust)
        .select(
            "s_suppkey",
            "c_custkey",
            (
                dlon * dlon
                + (F.col("slat") - F.col("clat")) * (F.col("slat") - F.col("clat"))
            ).alias("dist_sq"),
        )
        .filter(F.col("dist_sq") <= F.lit(10000000).cast("long") * 10000000)
    )
    want = {(r.s_suppkey, r.c_custkey, r.dist_sq) for r in brute.collect()}
    assert got == want and len(got) > 0


def test_decay_table_is_the_halflife_spec(spark):
    """The inlined integer decay curve must BE the 2^(-d/7) spec:
    exact at d=0 and the half-life, strictly decreasing throughout,
    and within 1 micro-unit of the real curve everywhere."""
    from stream_processing_project_spark.plans.olap import _DECAY_MICRO

    assert _DECAY_MICRO[0] == 1_000_000
    assert _DECAY_MICRO[7] == 500_000
    assert _DECAY_MICRO[14] == 250_000
    assert all(a > b for a, b in zip(_DECAY_MICRO, _DECAY_MICRO[1:]))
    for d, v in enumerate(_DECAY_MICRO):
        assert abs(v - (2.0 ** (-d / 7.0)) * 1e6) <= 0.5


def test_compaction_bins_are_hour_contiguous(spark):
    """Within each class, target files must cover disjoint ascending
    hour ranges (time-range pruning survives the merge), and no file
    is assigned before all of its predecessors."""
    rows = (
        all_queries()["maintenance_compaction_plan"]
        .builder(spark, SF_ORACLE)
        .collect()
    )
    by_class: dict[str, list] = {}
    for r in rows:
        by_class.setdefault(r.event_type, []).append(r)
    assert by_class
    for cls, files in by_class.items():
        files.sort(key=lambda r: r.file_hour)
        bins = [r.target_file_id for r in files]
        # bin ids must be non-decreasing along the hour order (contiguity)
        assert all(a <= b for a, b in zip(bins, bins[1:])), cls


def test_preference_pairs_dominance_and_uniqueness(spark):
    """Every pair's chosen must strictly out-score its rejected; each
    chosen/rejected id appears at most once per (lang, source)."""
    rows = (
        all_queries()["sampling_preference_pairs"]
        .builder(spark, SF_ORACLE)
        .collect()
    )
    assert rows
    seen_c, seen_r = set(), set()
    for r in rows:
        assert r.chosen_score > r.rejected_score
        assert 1 <= r.pair_rank <= 5
        assert (r.lang, r.source, r.chosen_id) not in seen_c
        assert (r.lang, r.source, r.rejected_id) not in seen_r
        seen_c.add((r.lang, r.source, r.chosen_id))
        seen_r.add((r.lang, r.source, r.rejected_id))


def test_bfs_hops_satisfy_edge_consistency(spark):
    """For every kept edge (src, dst): hop(dst) <= hop(src) + 1 (after
    enough rounds, the hop labeling is edge-consistent), and the
    source has hop 0."""
    from stream_processing_project_spark.plans.common import t

    hops = {
        r.nationkey: r.hop
        for r in all_queries()["olap_nation_bfs_hops"]
        .builder(spark, SF_ORACLE)
        .collect()
    }
    assert hops.get(0) == 0
    li = t(spark, SF_ORACLE, "lineitem")
    o = t(spark, SF_ORACLE, "orders")
    c = t(spark, SF_ORACLE, "customer")
    s = t(spark, SF_ORACLE, "supplier")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(c.c_nationkey.alias("src"), s.s_nationkey.alias("dst"))
        .agg(F.sum(cents).alias("w"))
        .filter(F.col("w") >= 900000000)
        .collect()
    )
    assert edges
    inf = float("inf")
    for e in edges:
        hs = hops.get(e.src)
        hd = hops.get(e.dst)
        hs = inf if hs is None else hs
        hd = inf if hd is None else hd
        if hs is not inf:
            assert hd <= hs + 1, (e.src, e.dst, hs, hd)


def test_pca_loading_is_the_dominant_eigenvector(spark):
    """Convergence check against an INDEPENDENT implementation: the
    integer power-iteration loading must align (|cos| > 0.999) with
    numpy's dominant eigenvector of the same quantized scatter
    matrix — oracle parity alone can't see a both-engines-wrong
    formulation."""
    np = pytest.importorskip("numpy")

    rows = (
        all_queries()["vector_pca_power_iteration"]
        .builder(spark, SF_ORACLE)
        .collect()
    )
    v = np.array([r.loading_micro for r in sorted(rows, key=lambda r: r.dim_idx)],
                 dtype=float)
    assert np.abs(v).max() == 1e6  # micro-unit normalization

    from stream_processing_project_spark.plans.common import t

    emb = t(spark, SF_ORACLE, "embeddings").select("embedding").collect()
    X = np.round(np.array([r.embedding for r in emb], dtype=float) * 1024.0)
    n = X.shape[0]
    M = n * (X.T @ X) - np.outer(X.sum(axis=0), X.sum(axis=0))
    w, vecs = np.linalg.eigh(M)
    top = vecs[:, int(np.argmax(np.abs(w)))]
    cos = abs(float(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top)))
    assert cos > 0.999, cos


def test_dp_release_noise_is_bounded_and_nonnegative(spark):
    """Laplace(1) noise from a 32-bit hash-uniform is bounded by
    ln(2^32) ≈ 22.2; releases are clamped at zero."""
    rows = (
        all_queries()["governance_dp_count_release"]
        .builder(spark, SF_ORACLE)
        .collect()
    )
    assert rows
    for r in rows:
        assert r.released_count >= 0
        assert abs(r.released_count - r.true_count) <= 23


def test_attribution_conserves_conversions_and_revenue(spark):
    """Credit must be conservative: summed over channels, conversions
    and revenue equal the raw purchase totals exactly."""
    from stream_processing_project_spark.plans.common import t

    out = (
        all_queries()["olap_attribution_last_touch"]
        .builder(spark, SF_ORACLE)
        .collect()
    )
    got_n = sum(r.n_conversions for r in out)
    got_cents = sum(r.revenue_cents for r in out)
    raw = (
        t(spark, SF_ORACLE, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
        )
        .collect()[0]
    )
    assert got_n == raw.n
    assert got_cents == raw.cents
