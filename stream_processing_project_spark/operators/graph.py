"""Iterative graph algorithms over edge DataFrames.

Beyond the reference's surface (like dedup's connected components,
SURVEY.md §2-extensions): the power-iteration family — PageRank here —
expressed as repeated joins of a rank table against a (once-computed)
transition-edge table. The repo's iterative-algorithm precedent is
dedup.connected_components (min-label propagation, per-round
localCheckpoint); this module follows the same execution conventions.

Determinism contract (full value-hash oracle despite iteration):
every quantity that crosses an aggregation is an exact bigint —
  * edge weights are summed from PER-ROW integer cents (round before
    the sum, so the sum is order-free),
  * transition probabilities are quantized to integer micro-units
    (round(w·1e6/w_out)),
  * ranks live in integer micro-units; each per-edge contribution
    rounds to a bigint BEFORE the incoming-sum, so float addition
    order never leaks into results.
The remaining float ops (one division / one multiply per term) see
identical operands in any engine, hence produce identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
) -> DataFrame:
    """Weighted PageRank by fixed-count power iteration.

    edges: (src, dst, w) with EXACT INTEGER weights (bigint — quantize
    upstream, e.g. revenue cents). Output: (node, r_micro) where
    r_micro ≈ rank × 1e6.

    r_{k+1}(v) = round((1-d)·1e6/n) + round(d · Σ_{u→v} c(u, v))
    with per-edge contribution c(u, v) = round(r_k(u) · p_micro(u,v) / 1e6)
    and p_micro(u,v) = round(w(u,v) · 1e6 / w_out(u)).

    Scale shape: the transition table is computed ONCE (one groupBy for
    out-weights + one join) and localCheckpoint-ed; each iteration is
    one broadcast join of the rank table (O(|nodes|) rows — broadcast-
    sized whenever the algorithm is tractable at all) against the edge
    table plus one map-side-combinable groupBy of O(|edges|) bigint
    contributions. Rank lineage is truncated per round (the
    connected_components convention), so plans stay flat across
    iterations. Dangling mass is dropped (nodes with no out-edges
    contribute nothing — document the graph accordingly); n counts
    every node appearing on either side."""
    outw = edges.groupBy(src).agg(F.sum(w).alias("_wout"))
    trans = (
        edges.join(outw, src)
        .withColumn(
            "p_micro",
            F.round(F.col(w) * F.lit(float(MICRO)) / F.col("_wout"), 0).cast(
                "long"
            ),
        )
        .select(F.col(src).alias("_src"), F.col(dst).alias("_dst"), "p_micro")
        .localCheckpoint()
    )
    nodes = (
        trans.select(F.col("_src").alias("node"))
        .unionByName(trans.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()  # bounded driver scalar (node count, not data)
    init = int(round(MICRO / n))
    base = int(round((1.0 - damping) * MICRO / n))
    ranks = nodes.withColumn("r_micro", F.lit(init).cast("long"))
    for _ in range(iterations):
        contrib = (
            trans.join(
                F.broadcast(ranks), trans["_src"] == ranks["node"]
            )
            .withColumn(
                "c",
                F.round(
                    F.col("r_micro") * F.col("p_micro") / F.lit(float(MICRO)),
                    0,
                ).cast("long"),
            )
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum("c").alias("_insum"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.round(
                        F.lit(damping) * F.coalesce("_insum", F.lit(0)), 0
                    ).cast("long")
                ).alias("r_micro"),
            )
            .localCheckpoint()
        )
    return ranks


def label_propagation(
    edges: DataFrame,
    iterations: int = 4,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
) -> DataFrame:
    """Synchronous weighted label propagation (community detection).

    edges: (src, dst, w) with EXACT INTEGER weights. The graph is
    symmetrized (parallel edges sum); every node starts in its own
    community (label = node id) and each round SIMULTANEOUSLY adopts
    the label carrying the maximum total incident weight among its
    neighbors, ties to the SMALLEST label — both rules are pure integer
    comparisons, so a fixed iteration count reproduces bit-for-bit in
    unrolled SQL (the pagerank determinism contract, with no float ops
    at all). Synchronous + tie-to-min also makes the result
    partitioning-invariant, unlike the asynchronous textbook LPA whose
    outcome depends on visit order.

    Scale shape: the symmetrized edge table is built once and
    localCheckpoint-ed; each round is one broadcast join of the
    O(|nodes|) label table against the edges, one (node, label)
    weight aggregate (map-side combined), and one integer argmax —
    label lineage truncates per round."""
    a, b = "_a", "_b"
    und = (
        edges.select(F.col(src).alias(a), F.col(dst).alias(b), F.col(w).alias("_w"))
        .unionByName(
            edges.select(
                F.col(dst).alias(a), F.col(src).alias(b), F.col(w).alias("_w")
            )
        )
        .groupBy(a, b)
        .agg(F.sum("_w").alias("_w"))
        .localCheckpoint()
    )
    labels = und.select(F.col(a).alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    for _ in range(iterations):
        scores = (
            und.join(F.broadcast(labels), und[b] == labels["node"])
            .groupBy(F.col(a).alias("node"), "lbl")
            .agg(F.sum("_w").alias("s"))
        )
        labels = (
            scores.groupBy("node")
            .agg(F.max(F.struct(F.col("s"), (-F.col("lbl")).alias("nl"))).alias("m"))
            .select("node", (-F.col("m.nl")).alias("lbl"))
            .localCheckpoint()
        )
    return labels.select("node", F.col("lbl").alias("community"))
