"""Same-session interleaved A/B for the two un-adjudicated BENCH_r10
normalized movers (VERDICT r10 task 2): cdc_upsert_materialize
(1.25x raw / 1.52x normalized) and corpus_build_pipeline (1.37x/1.66x).
The repo's drift standard: cross-round timing comparisons are
confounded by container drift; a regression claim needs same-day
single-session warm reps whose band excludes the prior number.

Method = the features_standard_scale treatment (r10): one bench-shaped
session (sf0.1, local[32]), one warm pass per query, then >=6 timed
reps each, interleaved A,B,A,B,... so box drift hits both equally.

    python scripts/adjudicate_movers_r11.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["cdc_upsert_materialize", "corpus_build_pipeline"]
REPS = 6


def main() -> None:
    from stream_processing_project_spark.plans.registry import all_queries
    from stream_processing_project_spark.session import get_spark

    spark = get_spark("adjudicate-movers")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    # warm: codegen + parquet footers
    for name in QUERIES:
        force(qs[name].builder(spark, SF_DIR))

    times: dict[str, list[float]] = {n: [] for n in QUERIES}
    for rep in range(REPS):
        for name in QUERIES:
            t0 = time.perf_counter()
            force(qs[name].builder(spark, SF_DIR))
            dt = time.perf_counter() - t0
            times[name].append(round(dt, 3))
            print(f"rep{rep} {name:28s} {dt:7.3f}s", flush=True)
    print()
    for name in QUERIES:
        xs = sorted(times[name])
        print(
            f"{name:28s} reps={times[name]} min={xs[0]:.3f} "
            f"median={xs[len(xs)//2]:.3f} max={xs[-1]:.3f}"
        )


if __name__ == "__main__":
    main()
