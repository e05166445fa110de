"""Skew-aware join: explicit key salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized partitions, but it only applies to
sort-merge joins and can't help when a single KEY (not partition) is
hot on BOTH sides. Salting is the explicit fix: replicate the small
side R times, scatter the big side's hot keys across R salt buckets,
join on (key, salt). This module makes the pattern a first-class
operator instead of a hand-rolled idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join big⨝small on `on`, with the big side scattered across
    `salt_buckets` pseudo-random salts and the small side replicated
    once per salt. Output columns = big's ++ small's (minus the dup key),
    same as a plain join.

    Cost model: small side shuffles ×R (cheap — it's small); the big
    side's hottest key now spreads over R tasks instead of one straggler.
    Deterministic salt (hash of the big side's whole row) so re-runs and
    retries place rows identically."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    b = big.withColumn("_salt", salt)
    s = small.join(
        small.sparkSession.range(salt_buckets).select(
            F.col("id").cast("int").alias("_salt")
        )
    )
    joined = b.join(s, [on, "_salt"], how)
    return joined.drop("_salt")
