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


def test_scd2_history_versions_and_deletes(spark):
    """SCD2: versions chain per key in (ts, id) order; a delete closes
    the prior version's valid_to but emits no row; only a live key's
    last version is current."""
    from stream_processing_project_spark.sources.cdc import scd2_history

    changes = spark.createDataFrame(
        [
            # key 1: create → update → delete  (no current version)
            (10, 1, "c", 100), (11, 1, "u", 200), (12, 1, "d", 300),
            # key 2: create → update           (second version current)
            (20, 2, "c", 150), (21, 2, "u", 250),
            # key 3: same-ts tie broken by id
            (30, 3, "c", 500), (31, 3, "u", 500),
        ],
        "id long, user_id long, __op string, __ts_ms long",
    )
    rows = {
        (r.user_id, r.version): r
        for r in scd2_history(changes).collect()
    }
    assert set(rows) == {(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2)}
    # delete closes key 1's last surviving version; nothing is current
    assert rows[(1, 2)].valid_to == 300 and rows[(1, 2)].is_current == 0
    assert rows[(1, 1)].valid_to == 200
    # key 2's open version is current
    assert rows[(2, 2)].valid_to is None and rows[(2, 2)].is_current == 1
    assert rows[(2, 1)].valid_to == 250 and rows[(2, 1)].is_current == 0
    # tie at ts=500 ordered by id: 30 before 31
    assert rows[(3, 1)].id == 30 and rows[(3, 1)].valid_to == 500
    assert rows[(3, 2)].id == 31 and rows[(3, 2)].is_current == 1


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(change, min_size=1, max_size=25),
    st.integers(min_value=0, max_value=25),
)
def test_latest_versions_merge_is_chunking_invariant(spark, rows, cut):
    """The incremental-merge foundation (streaming upsert view): folding
    the log in two chunks through latest_versions — with tombstones
    retained between steps — equals one-shot collapse of the whole log,
    for ANY random log and ANY split point. This is why the streaming
    view's final state cannot depend on micro-batch boundaries."""
    from stream_processing_project_spark.sources.cdc import latest_versions

    cols = ["id", "payload", "__op", "__ts_ms"]
    cut = min(cut, len(rows) - 1)
    whole = latest_versions(spark.createDataFrame(rows, cols))
    one_shot = {r["id"]: (r["payload"], r["__op"], r["__ts_ms"])
                for r in whole.collect()}
    if cut == 0 or cut == len(rows):
        chunked = one_shot
    else:
        first = latest_versions(spark.createDataFrame(rows[:cut], cols))
        second = latest_versions(
            first.unionByName(spark.createDataFrame(rows[cut:], cols))
        )
        chunked = {r["id"]: (r["payload"], r["__op"], r["__ts_ms"])
                   for r in second.collect()}
    assert chunked == one_shot
