"""Round-8 property pins.

DBSCAN input recall (ADVICE r07): `similarity_dbscan_clusters` consumes
`embedding_near_dup_pairs` at miss_prob=1e-8 — a single missed eps-pair
can cascade through core degree → connected components → border labels,
so the blocked path must match the all-pairs result EXACTLY at both
fixture scales, in the exact configuration the query runs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_project_spark.operators import similarity
from stream_processing_project_spark.sources.fixtures import load_table


def test_embedding_near_dup_lsh_exact_recall_sf01_dbscan_config(spark):
    """sf0.1 (2k vectors, ~2M candidate pairs exact-side) at the
    DBSCAN config (t=0.35, miss_prob=1e-8). Deterministic: seeded
    planes. Complements the sf0.01 pin in test_dedup_similarity.py."""
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dup_pairs(
            emb, 0.35, method="exact"
        )
        .select("id_a", "id_b")
        .collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dup_pairs(
            emb, 0.35, method="lsh", miss_prob=1e-8
        )
        .select("id_a", "id_b")
        .collect()
    }
    assert lsh == exact and len(exact) > 0


def test_dbscan_roles_partition_fixture(spark):
    """Every vector gets exactly one role row, and role counts are
    stable under the miss_prob tightening (regression canary for the
    r08 blocking-config change)."""
    from stream_processing_project_spark.plans import registry

    out = (
        registry.get("similarity_dbscan_clusters")
        .builder(spark, "/root/testdata/sf0.01")
        .groupBy("role")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = {r.role: r.n for r in out}
    n_emb = load_table(spark, "/root/testdata/sf0.01", "embeddings").count()
    assert sum(counts.values()) == n_emb
    assert set(counts) <= {"core", "border", "noise"}
    assert counts.get("core", 0) > 0
