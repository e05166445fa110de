"""Unit pins for the governance operators (profiling, PII redaction,
fuzzy linkage) — the edge cases the fixture-table oracles can't show:
null counting, negative-bucket histograms, redaction ordering, and
block isolation."""

from __future__ import annotations

from stream_processing_project_spark.operators.linkage import blocked_fuzzy_pairs
from stream_processing_project_spark.operators.profiling import (
    profile_columns,
    value_histogram,
)
from stream_processing_project_spark.operators.text import redact_pii


def test_profile_counts_nulls_distinct_and_string_lengths(spark):
    df = spark.createDataFrame(
        [(1.0, "aa"), (2.0, None), (None, "bbbb"), (2.0, "aa")],
        "v double, s string",
    )
    got = {
        r.col_name: r
        for r in profile_columns(df, ["v"], ["s"]).collect()
    }
    v, s = got["v"], got["s"]
    assert (v.n_rows, v.n_nulls, v.n_distinct) == (4, 1, 2)
    assert (v.min_val, v.max_val) == (1.0, 2.0)
    # string column profiles LENGTH; nulls excluded from distinct/min/max
    assert (s.n_rows, s.n_nulls, s.n_distinct) == (4, 1, 2)
    assert (s.min_val, s.max_val) == (2.0, 4.0)


def test_profile_approx_mode_still_one_row_per_column(spark):
    df = spark.createDataFrame([(float(i), str(i)) for i in range(50)],
                               "v double, s string")
    rows = profile_columns(df, ["v"], ["s"], exact=False).collect()
    assert sorted(r.col_name for r in rows) == ["s", "v"]
    for r in rows:  # HLL estimates are near-exact at this cardinality
        assert abs(r.n_distinct - 50) <= 3


def test_histogram_handles_negative_values_and_exact_edges(spark):
    df = spark.createDataFrame(
        [(-0.5,), (0.0,), (9.9,), (10.0,), (25.0,)], "v double"
    )
    got = {r.bucket: (r.cnt, r.lo, r.hi) for r in
           value_histogram(df, "v", 10.0).collect()}
    # floor(-0.5/10) = -1; 10.0 lands in bucket 1, not 0
    assert got == {-1: (1, -0.5, -0.5), 0: (2, 0.0, 9.9),
                   1: (1, 10.0, 10.0), 2: (1, 25.0, 25.0)}


def test_redact_pii_replaces_and_counts_each_kind(spark):
    df = spark.createDataFrame(
        [(1, "mail bob@ex.com from 1.2.3.4 call +1-555-1234 now")],
        "doc_id long, text string",
    )
    r = redact_pii(df).collect()[0]
    assert r.text == "mail <EMAIL> from <IP> call <PHONE> now"
    assert (r.n_emails, r.n_phones, r.n_ips) == (1, 1, 1)


def test_redact_pii_email_with_ip_like_domain_not_double_counted(spark):
    # user@10.0.0.1 is NOT an email (TLD must be alphabetic); the IP part
    # is still scrubbed, and because emails are replaced first, a real
    # mail's dotted domain is never counted as an IP.
    df = spark.createDataFrame(
        [(1, "a@10.0.0.1 and real@a.bc"), (2, "no pii here")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(df).collect()}
    assert rows[1].text == "a@<IP> and <EMAIL>"
    assert (rows[1].n_emails, rows[1].n_ips) == (1, 1)
    assert rows[2].text == "no pii here"
    assert (rows[2].n_emails, rows[2].n_phones, rows[2].n_ips) == (0, 0, 0)


def test_fuzzy_pairs_respect_blocks_threshold_and_order(spark):
    df = spark.createDataFrame(
        [
            (1, "red widget", "x"),
            (2, "red gadget", "x"),   # dist 2 from 1, same block
            (3, "red widget", "y"),   # identical text, DIFFERENT block
            (4, "blue widget", "x"),  # dist 4 from 1 — over threshold
        ],
        "id long, name string, blk string",
    )
    pairs = blocked_fuzzy_pairs(
        df, "id", "name", ["blk"], max_distance=3
    ).collect()
    assert [(p.id_a, p.id_b, p.dist) for p in pairs] == [(1, 2, 2)]


def test_multi_pass_blocking_unions_and_dedups(spark):
    """A pair caught only by the second pass appears; a pair caught by
    BOTH passes appears once."""
    from stream_processing_project_spark.operators.linkage import (
        multi_pass_fuzzy_pairs,
    )

    df = spark.createDataFrame(
        [
            # (1,2): same b1 AND same b2 → caught by both passes, once
            (1, "red widget", "x", "p"),
            (2, "red gadget", "x", "p"),
            # (3,4): different b1, same b2 → second pass only
            (3, "old anvil", "y", "q"),
            (4, "hot anvil", "z", "q"),
        ],
        "id long, name string, b1 string, b2 string",
    )
    pairs = multi_pass_fuzzy_pairs(
        df, "id", "name", [["b1"], ["b2"]], max_distance=3
    ).collect()
    got = sorted((p.id_a, p.id_b) for p in pairs)
    assert got == [(1, 2), (3, 4)]


def test_per_key_cap_bounds_and_is_partitioning_proof(spark):
    from stream_processing_project_spark.operators.sampling import per_key_cap

    rows = [(i, f"k{i % 3}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = per_key_cap(df, "source", cap=5).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.source, []).append((r.doc_id, r.keep_rank))
    assert set(by_key) == {"k0", "k1", "k2"}
    for key, kept in by_key.items():
        assert len(kept) == 5
        assert sorted(r for _, r in kept) == [1, 2, 3, 4, 5]
        # survivors are the 5 smallest identity hashes, not the 5 smallest ids
        ids = sorted(i for i, _ in kept)
        all_ids = [i for i, k in rows if k == key]
        byhash = sorted(all_ids, key=lambda i: ((i * 2654435761) % 4294967296, i))
        assert ids == sorted(byhash[:5])
    again = per_key_cap(df.repartition(17), "source", cap=5).collect()
    assert sorted((r.doc_id, r.keep_rank) for r in again) == sorted(
        (r.doc_id, r.keep_rank) for r in out
    )


def test_shard_shuffle_is_a_permutation_and_deterministic(spark):
    from stream_processing_project_spark.operators.sampling import shard_shuffle

    df = spark.createDataFrame([(i,) for i in range(64)], "doc_id long")
    out = shard_shuffle(df, shards=4).collect()
    assert len(out) == 64
    for r in out:
        assert r.shard == (r.doc_id * 2654435761) % 4294967296 % 4
    # positions are 1..n_shard contiguous within each shard, ordered by hash
    shards = {}
    for r in out:
        shards.setdefault(r.shard, []).append(r)
    for rows in shards.values():
        rows.sort(key=lambda r: r.pos)
        assert [r.pos for r in rows] == list(range(1, len(rows) + 1))
        hashes = [(r.doc_id * 2654435761) % 4294967296 for r in rows]
        assert hashes == sorted(hashes)
    again = shard_shuffle(df.repartition(13), shards=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_intradoc_dedup_keeps_first_occurrence_in_order(spark):
    """Planted repeats: only later duplicates of a passage are removed,
    order is preserved, and the operator's plan is a single narrow pass
    (no shuffle — no Exchange node anywhere)."""
    from stream_processing_project_spark.operators.text import intradoc_dedup

    rows = [
        (0, "a b c d a b e f"),   # "a b" repeats → second removed
        (1, "x y x y x y"),       # two later repeats removed
        (2, "p q r s"),           # no repeats
        (3, "z"),                 # single partial passage
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in intradoc_dedup(df, passage_words=2).collect()}
    assert got[0].clean_text == "a b c d e f"
    assert (got[0].n_passages, got[0].n_removed) == (4, 1)
    assert got[1].clean_text == "x y"
    assert (got[1].n_passages, got[1].n_removed) == (3, 2)
    assert got[2].clean_text == "p q r s"
    assert got[2].n_removed == 0
    assert got[3].clean_text == "z"
    assert (got[3].n_passages, got[3].n_removed) == (1, 0)
    plan = intradoc_dedup(df, passage_words=2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_histogram_quantiles_mergeable_and_bounded_error(spark):
    """The histogram sketch is mergeable by construction: quantiles from
    (partA histogram + partB histogram) equal quantiles from one pass —
    and each estimate sits within one bucket width of the exact
    percentile."""
    import pyspark.sql.functions as SF
    from stream_processing_project_spark.operators.profiling import (
        histogram_quantiles,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    one_pass = {
        r.event_type: (r.n, r.p50, r.p90, r.p99)
        for r in histogram_quantiles(df, "value", "event_type").collect()
    }
    # split, sketch each half, union the halves' raw rows — bin counts
    # add, so the merged result must be identical
    half_a = df.filter(SF.col("event_id") % 2 == 0)
    half_b = df.filter(SF.col("event_id") % 2 == 1)
    merged = {
        r.event_type: (r.n, r.p50, r.p90, r.p99)
        for r in histogram_quantiles(
            half_a.unionByName(half_b), "value", "event_type"
        ).collect()
    }
    assert merged == one_pass
    exact = {
        r.event_type: r.q
        for r in df.groupBy("event_type")
        .agg(SF.expr("percentile(value, 0.5)").alias("q"))
        .collect()
    }
    for et, (_, p50, _, _) in one_pass.items():
        assert abs(exact[et] - p50) <= 8.0  # within one bucket width


def test_drift_psi_detects_planted_shift(spark):
    """PSI is near zero when both periods share a distribution and
    clearly larger when one period is shifted; output is deterministic
    bigint arithmetic (two runs identical)."""
    import pyspark.sql.functions as SF
    from stream_processing_project_spark.operators.profiling import drift_psi

    n = 2000
    base = spark.range(n).select(
        SF.lit("g").alias("grp"),
        (SF.col("id") % 100).cast("double").alias("value"),
        SF.when(SF.col("id") % 2 == 0, "a").otherwise("b").alias("period"),
    )
    same = drift_psi(base, "value", "grp", "period").collect()[0]
    shifted = base.withColumn(
        "value",
        SF.when(SF.col("period") == "b", SF.col("value") + 200.0).otherwise(
            SF.col("value")
        ),
    )
    moved = drift_psi(shifted, "value", "grp", "period").collect()[0]
    assert same.psi_micro < 100_000          # ~0 PSI for identical halves
    assert moved.psi_micro > 1_000_000       # >1.0 PSI for disjoint supports
    again = drift_psi(shifted, "value", "grp", "period").collect()[0]
    assert tuple(moved) == tuple(again)


def test_char_entropy_extremes_and_determinism(spark):
    """Degenerate repetition scores ~0 nats, a uniform alphabet scores
    ln(k) nats (micro-quantized), and the result is identical across
    partitionings."""
    import math

    from stream_processing_project_spark.operators.text import char_entropy

    rows = [
        (0, "aaaaaaaa"),                 # zero entropy
        (1, "abcdabcdabcdabcd"),         # uniform over 4 chars → ln 4
        (2, "abcdefgh"),                 # uniform over 8 chars → ln 8
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in char_entropy(df).collect()}
    assert got[0].entropy_micro == 0
    assert abs(got[1].entropy_micro - round(math.log(4) * 1e6)) <= 4
    assert abs(got[2].entropy_micro - round(math.log(8) * 1e6)) <= 8
    assert (got[2].n_chars, got[2].n_distinct) == (8, 8)
    a = sorted(map(tuple, char_entropy(df).collect()))
    b = sorted(map(tuple, char_entropy(df.repartition(7)).collect()))
    assert a == b


def test_canonical_url_collapses_variants(spark):
    from pyspark.sql import functions as F

    from stream_processing_project_spark.operators.text import canonical_url

    variants = [
        "https://www.Site.Example.com/Page/1?utm_source=x&id=9",
        "HTTP://site.example.com/page/1#frag",
        "https://site.example.com/page/1/",
        "site.example.com/page/1",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    got = df.select(canonical_url(F.col("url")).alias("c")).distinct().collect()
    assert [r.c for r in got] == ["site.example.com/page/1"]


def test_strip_common_prefix_edge_cases(spark):
    from stream_processing_project_spark.operators.text import strip_common_prefix

    header = "h1 h2 h3 h4 h5 h6 h7 h8"
    rows = [
        # 3-of-4 docs in source A share the 8-token header -> stripped
        (0, "A", header + " body zero"),
        (1, "A", header + " body one"),
        (2, "A", header),  # exactly 8 tokens: strips to empty text
        (3, "A", "short doc"),  # < 8 tokens: never a candidate
        # source B: prefix unique per doc -> nothing stripped
        (4, "B", "b4 " + header),
        (5, "B", "b5 " + header),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.doc_id: r for r in strip_common_prefix(df, key_col="source").collect()}
    assert got[0].was_stripped and got[0].text_clean == "body zero"
    assert got[1].was_stripped and got[1].text_clean == "body one"
    assert got[2].was_stripped and got[2].text_clean == ""
    assert not got[3].was_stripped and got[3].text_clean == "short doc"
    assert not got[4].was_stripped and not got[5].was_stripped
    assert got[0].n_removed_tokens == 8 and got[3].n_removed_tokens == 0


def test_weighted_priority_sample_is_size_biased_and_exact_k(spark):
    from stream_processing_project_spark.operators.sampling import (
        weighted_priority_sample,
    )

    # one giant weight among uniform small ones: must always be sampled
    rows = [(i, 10) for i in range(200)] + [(200, 10_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_priority_sample(df, weight_col="w", k=20)
    ids = [r.doc_id for r in got.collect()]
    assert len(ids) == len(set(ids)) == 20  # without replacement
    assert 200 in ids
    # deterministic: same input -> same sample, any partitioning
    again = weighted_priority_sample(df.repartition(7), weight_col="w", k=20)
    assert sorted(ids) == sorted(r.doc_id for r in again.collect())


def test_cms_sketch_merges_and_never_undercounts(spark):
    from pyspark.sql import functions as F

    from stream_processing_project_spark.operators.profiling import (
        cms_estimate,
        cms_sketch,
    )

    df = spark.createDataFrame(
        [(i, i % 7) for i in range(300)] + [(300 + i, 99) for i in range(50)],
        "rid long, item long",
    )
    whole = cms_sketch(df, "item")
    # mergeable: sketches of disjoint halves sum bucket-wise to the whole
    h1 = cms_sketch(df.filter("rid < 175"), "item")
    h2 = cms_sketch(df.filter("rid >= 175"), "item")
    merged = (
        h1.unionByName(h2)
        .groupBy("h_row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))
    # one-sided error: estimate >= true count, exact for the heavy item
    est = {r.item: r.cms_est for r in cms_estimate(whole, df.distinct(), "item").collect()}
    exact = {r.item: r["count"] for r in df.groupBy("item").count().collect()}
    for k, v in exact.items():
        assert est[k] >= v


def test_bpe_train_matches_sequential_reference(spark):
    from stream_processing_project_spark.operators.bpe import bpe_segment, bpe_train, chars
    from pyspark.sql import functions as F

    words = [("table", 10), ("tablet", 5), ("stable", 3), ("able", 7),
             ("tab", 2), ("a", 1), ("belt", 4)]

    def py_bpe(ws, k):
        syms = {w: list(w) for w, _ in ws}
        cnts = dict(ws)
        rules = []
        for r in range(1, k + 1):
            pc = {}
            for w, s in syms.items():
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + cnts[w]
            if not pc:
                break
            (x, y), c = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            rules.append((r, x, y, x + y, c))
            for w, s in syms.items():
                out, pend = [], None
                for tok in s:
                    if pend is None:
                        pend = tok
                    elif pend == x and tok == y:
                        out.append(x + y)
                        pend = None
                    else:
                        out.append(pend)
                        pend = tok
                if pend is not None:
                    out.append(pend)
                syms[w] = out
        return rules, syms

    exp_rules, exp_syms = py_bpe(words, 6)
    wdf = spark.createDataFrame(words, "word string, cnt long")
    got = [tuple(r) for r in bpe_train(wdf, 6).collect()]
    assert got == exp_rules
    # encode step reproduces the trained segmentation per word
    merges = [(x, y) for _, x, y, _, _ in exp_rules]
    seg = {
        r.word: r.toks
        for r in wdf.select(
            "word", bpe_segment(chars(F.col("word")), merges).alias("toks")
        ).collect()
    }
    assert seg == exp_syms
