"""Distributed BPE tokenizer training — learn a byte-pair-encoding
merge table from a corpus (the tokenizer-fitting stage of an LLM data
pipeline; the reference has no tokenizer layer — SURVEY.md §7 M4
extension family).

Standard BPE trains on the WORD-FREQUENCY table, not the raw corpus:
one corpus scan builds (word, count), and every merge round then runs
over |vocab| rows — orders of magnitude smaller than the corpus, and
the part that must be distributed at 100 TB (a web-scale corpus has
hundreds of millions of distinct "words"). Each round is:

  1. adjacent-pair counts: explode each word's symbol array into
     (left, right) pairs weighted by word count — one map-side-combined
     groupBy (shuffle carries |distinct pairs| rows);
  2. argmax with lexicographic tie-break — a 1-row TakeOrderedAndProject;
  3. greedy left-to-right merge of the winning pair inside every word's
     symbol array — a pure `F.aggregate` fold, narrow, no shuffle.

The single collected row per round is the MODEL (the merge rule), the
same driver-side footprint as MLlib's per-iteration centroid collect;
data never leaves the cluster. Lineage truncates per round
(localCheckpoint — connected_components convention).

Determinism: counts are integers, ties break lexicographically (binary
collation both engines), and the merge fold is exact symbol algebra —
so the whole training run value-hash-oracles against an unrolled SQL
implementation of the same rounds (plans/governance.py builds it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chars(word: Column) -> Column:
    """Split a word into single-character symbols (Spark's empty-regex
    split emits a trailing empty string — slice to the word length)."""
    return F.slice(F.split(word, ""), 1, F.length(word))


def _apply_merge(syms: Column, x: str, y: str) -> Column:
    """Greedy left-to-right merge of the adjacent pair (x, y) inside a
    symbol array — after a merge the new token does not re-pair with
    the following symbol in the same round (single-pass BPE
    semantics). Fold state: (result array, pending symbol)."""
    init = F.struct(
        F.lit([]).cast("array<string>").alias("res"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc: Column, s: Column) -> Column:
        return (
            F.when(
                acc["pend"].isNull(),
                F.struct(acc["res"].alias("res"), s.alias("pend")),
            )
            .when(
                (acc["pend"] == F.lit(x)) & (s == F.lit(y)),
                F.struct(
                    F.concat(acc["res"], F.array(F.lit(x + y))).alias("res"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["res"], F.array(acc["pend"])).alias("res"),
                    s.alias("pend"),
                )
            )
        )

    def fin(acc: Column) -> Column:
        return F.when(acc["pend"].isNull(), acc["res"]).otherwise(
            F.concat(acc["res"], F.array(acc["pend"]))
        )

    return F.aggregate(syms, init, step, fin)


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs (empty for 1-symbol
    words)."""
    n = F.size(syms)
    left = F.slice(syms, 1, n - 1)
    right = F.slice(syms, 2, n - 1)
    return F.when(
        n >= 2,
        F.zip_with(
            left, right, lambda l, r: F.struct(l.alias("l"), r.alias("r"))
        ),
    ).otherwise(F.lit([]).cast("array<struct<l:string,r:string>>"))


def bpe_train(
    words: DataFrame,
    n_merges: int,
    word_col: str = "word",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Learn `n_merges` BPE merge rules from a (word, count) table.
    Returns the merge table (merge_round, lft, rgt, merged, pair_count)
    — the trained tokenizer model, in training order. Stops early if
    no adjacent pair remains."""
    spark = words.sparkSession
    # materialize the vocab once: every round reads the symbol table
    # twice (pair count + merge), and without the barrier each read
    # replays the corpus word-count scan upstream
    syms_df = words.select(
        F.col(cnt_col).cast("long").alias("cnt"),
        chars(F.col(word_col)).alias("l"),
    ).localCheckpoint()
    rules: list[tuple[int, str, str, str, int]] = []
    for r in range(1, n_merges + 1):
        best = (
            syms_df.select("cnt", F.explode(_adjacent_pairs(F.col("l"))).alias("p"))
            .groupBy(F.col("p.l").alias("lft"), F.col("p.r").alias("rgt"))
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "lft", "rgt")
            .limit(1)
            .collect()
        )
        if not best:
            break
        x, y, c = best[0]["lft"], best[0]["rgt"], best[0]["pair_count"]
        rules.append((r, x, y, x + y, c))
        syms_df = syms_df.select(
            "cnt", _apply_merge(F.col("l"), x, y).alias("l")
        ).localCheckpoint()
    return spark.createDataFrame(
        rules,
        "merge_round int, lft string, rgt string, merged string, pair_count long",
    )


def bpe_segment(syms: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply a trained merge list (in training order) to a symbol
    array — the tokenizer ENCODE step, usable corpus-wide as a narrow
    per-row pass once the model is trained."""
    out = syms
    for x, y in merges:
        out = _apply_merge(out, x, y)
    return out
