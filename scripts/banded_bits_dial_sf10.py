"""sf10 measurement of the AUTO band-length dial (VERDICT r10 task 3).

r10 measured the dial by hand at /tmp/sfcurve100 (200k vectors):
bits=12/L=24 -> 205.0 s, 3,994,800 verified pairs; bits=16/L=24 ->
82.7 s at 97.3% of pairs. This script re-measures with the dial IN
CODE: bits=None must resolve to auto_band_bits(200_000) = 16 and land
in the fast band, interleaved same-session with the explicit bits=12
leg (the repo's drift discipline: cross-round timing comparisons are
confounded by container drift; only same-session A/B counts).

    python scripts/scale_curve.py        # builds /tmp/sfcurve2 (sf1)
    python scripts/scale_curve_100x.py   # builds /tmp/sfcurve100
    python scripts/banded_bits_dial_sf10.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10 = "/tmp/sfcurve100"


def main() -> None:
    from pyspark.sql import functions as F

    from stream_processing_project_spark.operators.similarity import (
        _quantize_expr,
        auto_band_bits,
        banded_neardup_screen,
    )
    from stream_processing_project_spark.plans.streaming_queries import (
        _BND_DIM,
        _BND_IDOFF,
        _BND_MOD,
        _BND_NOISE_CASE,
        _BND_T,
        _BND_TABLES,
    )
    from stream_processing_project_spark.session import get_spark

    spark = get_spark("banded-bits-dial-sf10")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(SF10, "embeddings.parquet"))
    n = emb.count()
    print(f"static corpus n={n}  auto_band_bits(n)={auto_band_bits(n)}")

    def screen(bits):
        static = emb.selectExpr(
            "vec_id AS id_a",
            f"{_quantize_expr('embedding', _BND_DIM)} AS qqa",
        )
        arriv = (
            emb.filter(F.expr(f"vec_id % {_BND_MOD} = 0"))
            .selectExpr(
                "vec_id", f"{_quantize_expr('embedding', _BND_DIM)} AS qq0"
            )
            .selectExpr(
                f"vec_id + {_BND_IDOFF} AS id_b",
                f"transform(sequence(1, {_BND_DIM}),"
                f" d -> element_at(qq0, d) + {_BND_NOISE_CASE}) AS qqb",
            )
        )
        t0 = time.time()
        n_pairs = banded_neardup_screen(
            static, arriv, bits=bits, tables=_BND_TABLES, threshold=_BND_T
        ).count()
        return time.time() - t0, n_pairs

    # warm the session (tiny leg, JIT + shuffle service)
    w = emb.filter(F.col("vec_id") < 2000)
    banded_neardup_screen(
        w.selectExpr(
            "vec_id AS id_a", f"{_quantize_expr('embedding', _BND_DIM)} AS qqa"
        ),
        w.selectExpr(
            "vec_id + 1000000 AS id_b",
            f"{_quantize_expr('embedding', _BND_DIM)} AS qqb",
        ),
        bits=None,
        tables=_BND_TABLES,
        threshold=_BND_T,
    ).count()

    for rep in range(2):
        for label, bits in (("bits=12 (explicit)", 12), ("bits=None (auto)", None)):
            wall, pairs = screen(bits)
            print(
                f"rep{rep} {label:20s} wall={wall:8.1f}s verified_pairs={pairs:,}",
                flush=True,
            )


if __name__ == "__main__":
    main()
