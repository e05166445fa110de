"""Edge-case pins for the time-series and sketch additions — the cases
the fixture oracle can't isolate: bucket ties, all-gap series, sub-k
sketches, and the KMV merge law."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string, value double"
    )


T0 = datetime(2024, 1, 1, 0, 0, 0)


def test_m4_tie_on_timestamp_resolved_by_event_id(spark, tmp_path):
    """Two points with IDENTICAL ts in one bucket: first/last must
    follow event_id order, not arrival/partition order."""
    rows = [
        (2, T0, "a", 20.0),
        (1, T0, "a", 10.0),
        (3, T0 + timedelta(minutes=5), "a", 5.0),
    ]
    df = _events(spark, rows).repartition(4)
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)
    from stream_processing_project_spark.plans.registry import all_queries

    out = all_queries()["timeseries_m4_downsample"].builder(
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.v_first == 10.0 and r.v_last == 5.0
    assert r.v_min == 5.0 and r.v_max == 20.0 and r.n_points == 3


def test_interpolate_multi_hour_gap_is_linear(spark, tmp_path):
    """A 3-hour gap between observations 100 and 400 must fill 175/250/325
    (linear in the HOUR index, not nearest-neighbor), while locf holds 100."""
    rows = [
        (1, T0, "a", 1.0),
        (2, T0 + timedelta(hours=4), "a", 4.0),
    ]
    _events(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    from stream_processing_project_spark.plans.registry import all_queries

    out = {
        r.w_start: r
        for r in all_queries()["timeseries_interpolate"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    assert len(out) == 5
    mids = [out[f"2024-01-01 0{h}:00:00"] for h in (1, 2, 3)]
    assert [m.cents for m in mids] == [None] * 3
    assert [m.locf_cents for m in mids] == [100] * 3
    assert [m.lerp_cents for m in mids] == [175.0, 250.0, 325.0]


def test_kmv_full_population_in_sketch_is_exact(spark, tmp_path):
    """Cohorts smaller than k: estimates must equal exact counts
    (the estimator guard, not (k-1)P/h_k extrapolation)."""
    rows = []
    eid = 0
    for u in range(20):
        eid += 1
        rows.append((eid, T0, "purchase", 200.0, u))
    for u in range(10, 40):
        eid += 1
        rows.append((eid, T0, "error", 200.0, u))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string, value double, user_id bigint"
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    from stream_processing_project_spark.plans.registry import all_queries

    r = (
        all_queries()["profile_distinct_kmv_theta"]
        .builder(spark, str(tmp_path))
        .collect()[0]
    )
    assert (r.exact_a, r.exact_b, r.exact_both) == (20, 30, 10)
    assert (r.est_a, r.est_b, r.est_both) == (20.0, 30.0, 10.0)


def test_kmv_union_merge_law(spark):
    """KMV mergeability: sketch(A ∪ B) == truncate(sketch(A) ∪ sketch(B)).
    Checked directly on the hash sets that define the sketch."""
    P, K = 2147483647, 64
    h = lambda u: ((u % P) * 1103515245 + 12345) % P  # noqa: E731
    a = {h(u) for u in range(500)}
    b = {h(u) for u in range(300, 900)}
    direct = sorted(a | b)[:K]
    merged = sorted(set(sorted(a)[:K]) | set(sorted(b)[:K]))[:K]
    assert direct == merged
