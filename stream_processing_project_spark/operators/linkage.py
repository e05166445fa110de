"""Record linkage: blocked fuzzy matching on string similarity.

The reference joins only on exact keys (J1/J2, SURVEY.md §2.3); a
training-data / entity-resolution pipeline also needs approximate
matching — "are these two records the same thing despite typos". The
classic scalable shape is BLOCK → COMPARE:

  1. Block: equi-join on a cheap deterministic key (here an exact
     attribute; in general a phonetic code, sorted-neighborhood window,
     or LSH bucket — see operators/dedup.py for the MinHash variant).
     This is a hash join Catalyst handles natively; the block key
     bounds the quadratic comparison space to within-block pairs.
  2. Compare: exact edit distance (`levenshtein`, JVM codegen'd) only
     on the blocked candidate pairs, keep pairs under the threshold.

Scale: the cost driver is the largest block (sum of |block|²). At
100 TB, pick block keys with bounded frequency (add a second attribute
to split hot blocks — the same salting idea as operators/skew.py), run
multiple complementary blocking passes, and union the pair sets;
never compare across blocks. The `a.id < b.id` predicate sits in the
join condition so each unordered pair is generated once, not twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    max_distance: int,
) -> DataFrame:
    """Candidate duplicate pairs (id_a, id_b, <texts>, dist) where both
    records share the blocking key(s) and edit distance <= threshold.
    Self-join de-duplicated by id_a < id_b inside the join condition.

    COMPARE-stage cost control (the expensive half of BLOCK→COMPARE):
    a length pre-filter in the join condition prunes pairs whose length
    gap already exceeds the budget (|len(a)-len(b)| ≤ k is necessary
    for dist ≤ k — an O(1) test ahead of the O(n·k) one), and the
    distance itself runs in Spark's BOUNDED form
    (levenshtein(l, r, threshold), 3.5+) which early-exits the DP once
    the running minimum passes the threshold — O(k·min(n,m)) per pair
    instead of O(n·m), and far less for clearly-different strings."""
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias(f"{text_col}_a"),
        *[F.col(c) for c in block_cols],
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias(f"{text_col}_b"),
        *[F.col(c).alias(f"{c}_b") for c in block_cols],
    )
    cond = F.col("id_a") < F.col("id_b")
    for c in block_cols:
        cond = cond & (F.col(c) == F.col(f"{c}_b"))
    cond = cond & (
        F.abs(
            F.length(F.col(f"{text_col}_a")) - F.length(F.col(f"{text_col}_b"))
        )
        <= max_distance
    )
    dist = F.levenshtein(
        F.col(f"{text_col}_a"), F.col(f"{text_col}_b"), max_distance
    )
    return (
        a.join(b, cond)
        .withColumn("dist", dist)
        .filter(F.col("dist") >= 0)  # bounded form returns -1 past threshold
        .select("id_a", "id_b", f"{text_col}_a", f"{text_col}_b", "dist")
    )


def multi_pass_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    passes: list[list],
    max_distance: int,
) -> DataFrame:
    """Union of several complementary blocking passes, de-duplicated on
    the pair key — the production record-linkage shape: each pass uses
    a CHEAP high-selectivity key (here different name tokens + an exact
    attribute) so every block stays small, and the union restores the
    recall a single coarse key would need quadratic work to reach. Pair
    dedup is an aggregation on (id_a, id_b) — exact, one shuffle over
    candidate pairs only."""
    parts = [
        blocked_fuzzy_pairs(df, id_col, text_col, cols, max_distance)
        for cols in passes
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates(["id_a", "id_b"])
