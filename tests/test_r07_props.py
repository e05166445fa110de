"""r07 regression pins: ADVICE.md items + new-operator properties."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_SMOKE = "/root/testdata/sf0.001"


def test_classifier_empty_corpus_returns_empty_frame(spark, tmp_path):
    """ADVICE r06: text_classifier_train_lr executed eagerly and crashed
    (TypeError on NULL gradient sums / ZeroDivision on nd=0) when the
    documents table was empty. It must return the empty output frame."""
    src = pq.read_table(os.path.join(SF_SMOKE, "documents.parquet"))
    empty_dir = tmp_path / "empty_sf"
    empty_dir.mkdir()
    pq.write_table(src.slice(0, 0), str(empty_dir / "documents.parquet"))

    from stream_processing_project_spark.plans.registry import get

    out = get("text_classifier_train_lr").builder(spark, str(empty_dir))
    assert out.count() == 0
    assert out.columns == [
        "n_docs",
        "w0_micro",
        "w1_micro",
        "w2_micro",
        "w3_micro",
        "n_correct",
        "accuracy",
    ]


def test_half_away_decimal_matches_half_up_on_binary_boundary():
    """ADVICE r06: floor(abs(x)+0.5) breaks on the 0.49999999999999994
    class (abs(x)+0.5 rounds up across an integer boundary in binary).
    The Decimal path must round exactly like decimal HALF_UP."""
    import decimal

    def half_away(x: float) -> int:
        return int(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP
            )
        )

    # the canonical counterexample: 0.49999999999999994 + 0.5 == 1.0 in
    # binary, so the floor formula yields 1 — decimal HALF_UP says 0
    assert half_away(0.49999999999999994) == 0
    assert half_away(-0.49999999999999994) == 0
    assert half_away(0.5) == 1
    assert half_away(-0.5) == -1
    assert half_away(2.5) == 3
    assert half_away(-2.5) == -3
    assert half_away(1.4999999999999998) == 1
