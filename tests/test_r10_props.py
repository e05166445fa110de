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
    for name in ("similarity_ann_lsh", "similarity_ann_ivf"):
        assert get(name).builder(spark, str(d)).count() == 0, name


def test_r10_ann_plan_shapes(spark):
    """Candidates must come from equi-joins on bucket/cid codes — never
    an all-pairs loop (the blocked-similarity invariant the oracled
    twins already pin, now applied to the GEMM registrations)."""
    from tests.test_plan_properties import formatted_plan

    for name in ("similarity_ann_lsh", "similarity_ann_ivf"):
        plan = formatted_plan(get(name).builder(spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
