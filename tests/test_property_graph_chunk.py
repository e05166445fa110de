"""Property-based checks (hypothesis): connected components against a
union-find reference model on random edge lists, and chunking coverage
invariants across random document lengths and chunk geometries."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stream_processing_project_spark.operators.dedup import connected_components
from stream_processing_project_spark.operators.text import chunk_documents

edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),
        st.integers(min_value=0, max_value=15),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
)


def union_find_labels(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(edges)
def test_connected_components_matches_union_find(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id for r in connected_components(df).collect()}
    assert got == union_find_labels(pairs)


doc_lengths = st.lists(st.integers(min_value=1, max_value=90), min_size=1, max_size=6)
geometry = st.tuples(
    st.integers(min_value=2, max_value=40),  # chunk_tokens
    st.integers(min_value=1, max_value=40),  # stride (> chunk_tokens = gapped)
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(doc_lengths, geometry)
def test_chunk_documents_invariants(spark, lengths, geom):
    chunk_tokens, stride = geom
    docs = [(i, " ".join(f"t{j}" for j in range(n))) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    by_doc = {}
    for r in chunk_documents(df, chunk_tokens=chunk_tokens, stride=stride).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for (doc_id, text), n in zip(docs, lengths):
        toks = text.split(" ")
        rows = sorted(by_doc[doc_id], key=lambda r: r.chunk_start)
        assert [r.chunk_start for r in rows] == [stride * i for i in range(len(rows))]
        for r in rows:
            assert r.chunk_text.split(" ") == toks[r.chunk_start : r.chunk_start + chunk_tokens]
            assert r.n_chunk_tokens == min(chunk_tokens, n - r.chunk_start)
            assert r.n_chunk_tokens >= 1  # never an empty chunk (gapped incl.)
            assert r.chunk_start < n  # never a start past the last token
        if stride <= chunk_tokens:
            # overlapping mode: full coverage, no fully-contained fragment
            assert rows[-1].chunk_start + rows[-1].n_chunk_tokens == n
            for prev, cur in zip(rows, rows[1:]):
                assert cur.chunk_start + cur.n_chunk_tokens > prev.chunk_start + chunk_tokens
        else:
            # gapped sampling: one chunk at the head of every stride window
            assert len(rows) == (n + stride - 1) // stride


def test_connected_components_raises_when_unconverged(spark):
    """Exhausting max_iter with labels still moving must raise — partial
    labels would silently split one cluster into several."""
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], ["doc_a", "doc_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)


pack_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),   # key (2 groups)
        st.integers(min_value=1, max_value=40),  # n_tokens
    ),
    min_size=1,
    max_size=14,
)


def greedy_pack_reference(tokens, capacity):
    """Driver-side replay of the greedy recurrence."""
    out, acc, pid = [], 0, 0
    for tok in tokens:
        if acc > 0 and acc + tok > capacity:
            pid, acc = pid + 1, 0
        acc += tok
        out.append(pid)
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(pack_rows, st.integers(min_value=5, max_value=30))
def test_pack_sequences_matches_reference_and_invariants(spark, rows, capacity):
    from collections import defaultdict

    from stream_processing_project_spark.operators.sampling import pack_sequences

    data = [(i, f"k{key}", tok) for i, (key, tok) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, lang string, n_tokens int")
    got = {
        r.doc_id: r.pack_id
        for r in pack_sequences(df, "n_tokens", capacity=capacity).collect()
    }
    # 1. exact match vs the sequential reference, per key in id order
    per_key = defaultdict(list)
    for i, (key, tok) in enumerate(rows):
        per_key[key].append((i, tok))
    for key, items in per_key.items():
        ref = greedy_pack_reference([tok for _, tok in items], capacity)
        assert [got[i] for i, _ in items] == ref
    # 2. invariants: bins are contiguous from 0; fill ≤ capacity unless
    # the bin holds a single oversize document
    for key, items in per_key.items():
        fills = defaultdict(list)
        for i, tok in items:
            fills[got[i]].append(tok)
        assert sorted(fills) == list(range(len(fills)))
        for toks in fills.values():
            assert sum(toks) <= capacity or len(toks) == 1
