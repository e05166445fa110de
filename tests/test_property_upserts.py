"""Property-based check (hypothesis): materialize_upserts agrees with a
straightforward Python reference model on random change logs — random
keys, versions, op codes, and tie-prone timestamps."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stream_processing_project_spark.sources.cdc import materialize_upserts

change = st.tuples(
    st.integers(min_value=0, max_value=5),          # id (few keys → collisions)
    st.text(alphabet="abc", min_size=0, max_size=3),  # payload
    st.sampled_from(["c", "u", "d"]),               # __op
    st.integers(min_value=0, max_value=4),          # __ts_ms (ties likely)
)


def model(rows):
    """Latest version per key (max by (ts, payload, op) — the same total
    order the struct-max uses: ts first, then remaining columns in frame
    order); keys whose winning row is a delete vanish."""
    best = {}
    for rid, payload, op, ts in rows:
        cand = (ts, payload, op)
        if rid not in best or cand > best[rid]:
            best[rid] = cand
    return {
        rid: (payload, op, ts)
        for rid, (ts, payload, op) in best.items()
        if op != "d"
    }


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(change, min_size=1, max_size=25))
def test_materialize_upserts_matches_model(spark, rows):
    df = spark.createDataFrame(rows, ["id", "payload", "__op", "__ts_ms"])
    got = {
        r["id"]: (r["payload"], r["__op"], r["__ts_ms"])
        for r in materialize_upserts(df).collect()
    }
    assert got == model(rows)
