"""Pins for the bench harness's round-over-round comparison — pure
driver-side logic (no Spark), so failures here are arithmetic bugs, not
plan changes. The canary normalization (r05 verdict task 3) is the part
that must be right: a uniform container slowdown must cancel in the
normalized series, and a genuine plan regression must survive it.
"""

from __future__ import annotations

import json

from bench import regressions_vs_last_round


def _write_round(tmp_path, n, queries, value=1.0, sf=0.1, canary=None):
    parsed = {"sf": sf, "value": value, "queries": queries}
    if canary is not None:
        parsed["canary"] = canary
    (tmp_path / f"BENCH_r{n:02d}.json").write_text(
        json.dumps({"parsed": parsed})
    )


def test_no_prior_round_returns_none(tmp_path):
    assert regressions_vs_last_round({"q": 1.0}, 0.1, bench_dir=str(tmp_path)) is None


def test_sf_mismatch_skips_comparison(tmp_path):
    _write_round(tmp_path, 5, {"q": 1.0}, sf=0.1)
    assert (
        regressions_vs_last_round({"q": 9.0}, 0.01, bench_dir=str(tmp_path))
        is None
    )


def test_raw_flag_over_1_5x(tmp_path):
    _write_round(tmp_path, 5, {"fast": 1.0, "slow": 1.0})
    reg = regressions_vs_last_round(
        {"fast": 1.2, "slow": 1.6}, 0.1, bench_dir=str(tmp_path)
    )
    assert set(reg["regressions_over_1_5x"]) == {"slow"}
    assert reg["regressions_over_1_5x"]["slow"]["ratio"] == 1.6
    # no canary on either side → no normalized section
    assert "normalized_regressions_over_1_5x" not in reg


def test_uniform_container_drift_cancels_under_canary(tmp_path):
    """The r04/r05 adjudication case: every query 2x slower AND the
    canary 2x slower → raw flags fire, normalized flags are EMPTY (the
    box changed, not the code)."""
    _write_round(
        tmp_path, 5, {"a": 1.0, "b": 0.5}, canary={"canary_s": 0.5}
    )
    reg = regressions_vs_last_round(
        {"a": 2.0, "b": 1.0}, 0.1,
        canary={"canary_s": 1.0}, bench_dir=str(tmp_path),
    )
    assert set(reg["regressions_over_1_5x"]) == {"a", "b"}  # raw fires
    assert reg["canary_ratio_vs_prior"] == 2.0
    assert reg["normalized_regressions_over_1_5x"] == {}  # drift cancels


def test_real_regression_survives_canary_normalization(tmp_path):
    """A query 4x slower on a box only 2x slower is a CODE regression:
    the normalized ratio (2.0) must flag while an innocently-drifting
    sibling (raw 2x = exactly the box factor) must not."""
    _write_round(
        tmp_path, 5, {"bad": 1.0, "ok": 1.0}, canary={"canary_s": 0.5}
    )
    reg = regressions_vs_last_round(
        {"bad": 4.0, "ok": 2.0}, 0.1,
        canary={"canary_s": 1.0}, bench_dir=str(tmp_path),
    )
    norm = reg["normalized_regressions_over_1_5x"]
    assert set(norm) == {"bad"}
    assert norm["bad"]["ratio"] == 2.0
    assert norm["bad"]["prior_norm"] == 2.0 and norm["bad"]["now_norm"] == 4.0


def test_newest_round_wins(tmp_path):
    _write_round(tmp_path, 4, {"q": 10.0})
    _write_round(tmp_path, 5, {"q": 1.0})
    reg = regressions_vs_last_round({"q": 2.0}, 0.1, bench_dir=str(tmp_path))
    assert reg["baseline_file"] == "BENCH_r05.json"
    assert reg["regressions_over_1_5x"]["q"]["prior_s"] == 1.0


def test_bench_line_fits_driver_tail_capture():
    """r07: the driver parses the bench line out of a 2000-char tail
    capture — r06's line outgrew it (BENCH_r06.json parsed: null), so
    compact_line must shed detail blocks (never the contract fields)
    until the line fits."""
    import json

    from bench import compact_line

    big = {
        "metric": "batch_suite_seconds",
        "value": 1.0,
        "unit": "sec",
        "queries": {f"q{i:03d}_some_longish_name": 1.234 for i in range(40)},
        "canary": {"compute_s": 0.2, "shuffle_s": 0.5, "canary_s": 0.7},
        "sf": 0.1,
        "streaming": {
            "events_per_sec": 40000,
            "dedup_events_per_sec": 100000,
            "pipeline": "x" * 400,
        },
        "vs_prior_round": {
            "baseline_file": "BENCH_r06.json",
            "prior_total_s": 20.0,
            "canary_ratio_vs_prior": 1.01,
            "regressions_over_1_5x": {
                f"r{i}": {"prior_s": 1, "now_s": 2, "ratio": 2.0}
                for i in range(12)
            },
            "normalized_regressions_over_1_5x": {
                f"r{i}": {"prior_norm": 1, "now_norm": 2, "ratio": 2.0}
                for i in range(12)
            },
        },
    }
    line = compact_line(big)
    assert len(line) <= 1900
    d = json.loads(line)
    # the driver contract survives compaction verbatim
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert d[k] == big[k]


def test_bench_line_keeps_canary_end_drift_signal():
    """r12 (VERDICT r11 what's-wrong #1/#2): the end-of-suite canary
    must survive compaction — degraded to its canary_s scalar when the
    line is over budget, never silently dropped — so mid-suite box
    drift stays adjudicable from the driver's tail capture."""
    import json

    from bench import compact_line

    big = {
        "metric": "batch_suite_seconds",
        "value": 1.0,
        "unit": "sec",
        "queries": {f"q{i:03d}_some_longish_name": 1.234 for i in range(40)},
        "canary": {"compute_s": 0.2, "shuffle_s": 0.5, "canary_s": 0.7},
        "canary_end": {"compute_s": 0.4, "shuffle_s": 0.9, "canary_s": 1.3},
        "sf": 0.1,
        "streaming": {
            "events_per_sec": 40000,
            "dedup_events_per_sec": 100000,
            "pipeline": "x" * 400,
        },
        "vs_prior_round": {
            "baseline_file": "BENCH_r11.json",
            "prior_total_s": 30.0,
            "canary_ratio_vs_prior": 1.01,
            "regressions_over_1_5x": {
                f"r{i}": {"prior_s": 1, "now_s": 2, "ratio": 2.0}
                for i in range(12)
            },
            "normalized_regressions_over_1_5x": {
                f"r{i}": {"prior_norm": 1, "now_norm": 2, "ratio": 2.0}
                for i in range(12)
            },
        },
    }
    line = compact_line(big)
    assert len(line) <= 1900
    d = json.loads(line)
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert d[k] == big[k]
    # both canaries visible; the end canary keeps at least canary_s
    assert d["canary"]["canary_s"] == 0.7
    assert d["canary_end"]["canary_s"] == 1.3
    # a line already under budget keeps the full decomposition
    small = {k: v for k, v in big.items() if k != "vs_prior_round"}
    small["queries"] = {"q": 1.0}
    d2 = json.loads(compact_line(small))
    assert d2["canary_end"] == big["canary_end"]


def test_bench_prior_salvages_r06_tail():
    """r07: BENCH_r06.json has parsed: null (its line outgrew the tail
    capture); _salvage_from_tail must recover the canary, the streaming
    block and the visible query-map suffix so the normalized comparison
    arms instead of silently skipping."""
    import json
    import os

    from bench import _salvage_from_tail

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_r06.json",
    )
    with open(path) as f:
        record = json.load(f)
    assert record.get("parsed") is None  # the defect this pin documents
    prior = _salvage_from_tail(record)
    assert prior is not None and prior.get("_salvaged") is True
    assert prior["canary"]["canary_s"] == 0.759
    assert prior["streaming"]["events_per_sec"] == 39112
    assert "timeseries_sax_symbols" in prior["queries"]
    assert prior["sf"] == 0.1
