"""PageRank semantics on planted graphs: mass conservation, symmetry,
sink attraction, and determinism of the integer-quantized iteration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_processing_project_spark.operators.graph import pagerank


@pytest.fixture(scope="module")
def spark():
    from stream_processing_project_spark.session import get_spark

    return get_spark("test-graph", shuffle_partitions=4)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src int, dst int, w long")


def test_symmetric_cycle_gives_uniform_ranks(spark):
    """A weight-symmetric cycle has the uniform stationary distribution;
    every node must land on the same rank (micro-unit exact)."""
    ring = _edges(spark, [(i, (i + 1) % 4, 10) for i in range(4)])
    got = {r.node: r.r_micro for r in pagerank(ring, iterations=10).collect()}
    assert len(set(got.values())) == 1
    assert abs(sum(got.values()) - 1_000_000) < 100  # mass conserved

def test_sink_heavy_node_outranks_others(spark):
    """Everyone points at node 0 (which points back out equally): node 0
    must hold the highest rank."""
    n = 5
    rows = [(i, 0, 5) for i in range(1, n)] + [(0, i, 1) for i in range(1, n)]
    got = {r.node: r.r_micro for r in pagerank(_edges(spark, rows), iterations=10).collect()}
    assert got[0] == max(got.values())
    assert all(got[0] > got[i] for i in range(1, n))


def test_weighted_split_follows_weights(spark):
    """0 splits 3:1 between 1 and 2 (who return the mass): rank(1) must
    exceed rank(2)."""
    rows = [(0, 1, 3), (0, 2, 1), (1, 0, 1), (2, 0, 1)]
    got = {r.node: r.r_micro for r in pagerank(_edges(spark, rows), iterations=10).collect()}
    assert got[1] > got[2] > 0


def test_pagerank_deterministic_across_partitionings(spark):
    """Integer-quantized contributions make the result partitioning-
    invariant — rerun on a repartitioned edge table must be identical."""
    rows = [(i, (i * 3 + 1) % 7, (i % 3) + 1) for i in range(7)]
    e = _edges(spark, rows)
    a = sorted(map(tuple, pagerank(e, iterations=8).collect()))
    b = sorted(map(tuple, pagerank(e.repartition(13), iterations=8).collect()))
    assert a == b


def test_label_propagation_finds_two_cliques(spark):
    """Two 3-cliques joined by one weak bridge: LPA must give each
    clique one community and keep the two apart (the bridge weight
    cannot outvote in-clique mass)."""
    from stream_processing_project_spark.operators.graph import label_propagation

    clique1 = [(0, 1, 10), (1, 2, 10), (0, 2, 10)]
    clique2 = [(3, 4, 10), (4, 5, 10), (3, 5, 10)]
    bridge = [(2, 3, 1)]
    got = {
        r.node: r.community
        for r in label_propagation(
            _edges(spark, clique1 + clique2 + bridge), iterations=4
        ).collect()
    }
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]


def test_label_propagation_deterministic_across_partitionings(spark):
    """Synchronous update + tie-to-min label: identical output on a
    repartitioned edge table."""
    from stream_processing_project_spark.operators.graph import label_propagation

    rows = [(i, (i * 5 + 2) % 11, (i % 4) + 1) for i in range(11)]
    e = _edges(spark, rows)
    a = sorted(map(tuple, label_propagation(e, iterations=3).collect()))
    b = sorted(map(tuple, label_propagation(e.repartition(13), iterations=3).collect()))
    assert a == b
