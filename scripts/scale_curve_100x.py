"""100× scale curves for the worst-exponent operators (VERDICT r03
task 6): the five whose 10× ratio was highest in the r03 tables
(PCA 2.3×, curriculum 2.7×, data card 2.2×, skew gini 1.8×,
masking 1.7×) get a second decade, separating constant-factor floors
(ratio stays flat decade-over-decade → the 10× number was mostly
fixed overhead) from genuine data-sized growth (ratio approaches 10×).

Builds /tmp/sfcurve100 (≈sf10: 10M events, 500k documents, 1.5M
customers, 200k embeddings) by replicating the sf1 corpus from
scale_curve.py another 10× with offset ids, then times each query at
sf0.1 / sf1 / sf10.

    python scripts/scale_curve.py       # builds /tmp/sfcurve2 (sf1)
    python scripts/scale_curve_100x.py  # this script
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from scripts.scale_curve import SCALED, SF1, build_sf1

SF10 = "/tmp/sfcurve100"

QUERIES = [
    "vector_pca_power_iteration",   # embeddings
    "sampling_curriculum_anneal",   # documents
    "corpus_data_card",             # documents
    "profile_skew_gini",            # events
    "governance_column_masking",    # customer
]
TABLES = ["events", "documents", "customer", "embeddings"]
PASSTHROUGH = ["region", "nation", "supplier", "part", "orders", "lineitem"]


def build_sf10() -> None:
    build_sf1()  # ensure the sf1 base exists
    os.makedirs(SF10, exist_ok=True)
    con = duckdb.connect()
    for name in TABLES:
        out = os.path.join(SF10, f"{name}.parquet")
        if os.path.exists(out):
            continue
        sel = SCALED[name]
        con.execute(
            "CREATE OR REPLACE VIEW t AS SELECT * FROM "
            f"read_parquet('{SF1}/{name}.parquet')"
        )
        id_col = sel.split(" + ")[0].replace("SELECT ", "").strip()
        mx = con.execute(f"SELECT max({id_col}) FROM t").fetchone()[0]
        stride = 10 ** len(str(mx))
        union = " UNION ALL ".join(sel.format(off=i * stride) for i in range(10))
        con.execute(f"COPY ({union}) TO '{out}' (FORMAT PARQUET)")
        print("built", out, flush=True)
    for name in PASSTHROUGH:
        out = os.path.join(SF10, f"{name}.parquet")
        if not os.path.exists(out):
            os.symlink(os.path.join(SF1, f"{name}.parquet"), out)


def main() -> None:
    build_sf10()
    from stream_processing_project_spark.plans.registry import all_queries
    from stream_processing_project_spark.session import get_spark

    spark = get_spark("scale-curve-100x")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    print(
        f"{'query':32s} {'sf0.1':>8s} {'sf1':>8s} {'sf10':>8s}"
        f" {'x(0.1->1)':>10s} {'x(1->10)':>10s}"
    )
    # graph-build cache discipline: see scripts/scale_curve.py — the
    # build query clears the session graph cache before every run;
    # dependents keep it so their numbers are serving-only
    from stream_processing_project_spark.plans import extensions as _ext

    def _pre(name):
        if name in ("similarity_nn_descent_graph",):
            _ext._NN_GRAPH_CACHE.clear()

    for name in (sys.argv[1:] or QUERIES):  # optional subset, like scale_curve.py
        times = []
        for sf_dir in ["/root/testdata/sf0.1", SF1, SF10]:
            _pre(name)
            force(qs[name].builder(spark, sf_dir))  # warm codegen
            _pre(name)
            t0 = time.perf_counter()
            force(qs[name].builder(spark, sf_dir))
            times.append(time.perf_counter() - t0)
        r1 = times[1] / times[0] if times[0] > 0 else float("nan")
        r2 = times[2] / times[1] if times[1] > 0 else float("nan")
        print(
            f"{name:32s} {times[0]:8.2f} {times[1]:8.2f} {times[2]:8.2f}"
            f" {r1:10.1f} {r2:10.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
