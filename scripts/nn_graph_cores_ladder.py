"""Cores ladder for the NN-Descent sf10 build + insert-lifecycle timing
(VERDICT r09 tasks 4 and 5).

Task 5: the build's 5.8×/decade within-session residual and the
515-vs-190 s leg-1 container variance want the stateful-family
treatment — if the sf10 (/tmp/sfcurve100, 200k embeddings) build's wall
time scales ~1/cores on a local[8/16/32] ladder, the residual shards
with parallelism (i.e. with executors at cluster scale) and is a
constant-throughput cost, not a serialization.

Task 4: with the filtered index on the session cache
(extensions._nn_graph_shared variant key), similarity_graph_insert_batch
pays the build ONCE per session; the second run in the same session
must land in the routing-cost class. The insert point here times both
runs in one fresh session.

One (query, cores) point per PROCESS (fresh session, empty graph
cache), so the parent loops via subprocess:

    python scripts/nn_graph_cores_ladder.py              # full ladder
    python scripts/nn_graph_cores_ladder.py --point build 16
    python scripts/nn_graph_cores_ladder.py --point insert 32
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10 = "/tmp/sfcurve100"


def run_point(kind: str, cores: int) -> None:
    from pyspark.sql import SparkSession

    shuffle = os.environ.get("LADDER_SHUFFLE_PARTITIONS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.session.timeZone", "UTC")
        .appName(f"nn-ladder-{kind}-{cores}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from stream_processing_project_spark.plans.registry import all_queries

    qs = all_queries()

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    if kind == "build":
        t0 = time.perf_counter()
        force(qs["similarity_nn_descent_graph"].builder(spark, SF10))
        wall = time.perf_counter() - t0
        print(json.dumps({"kind": kind, "cores": cores, "build_s": round(wall, 1)}))
    else:  # insert: first touch pays the filtered build, rerun = routing
        t0 = time.perf_counter()
        force(qs["similarity_graph_insert_batch"].builder(spark, SF10))
        first = time.perf_counter() - t0
        t1 = time.perf_counter()
        force(qs["similarity_graph_insert_batch"].builder(spark, SF10))
        routed = time.perf_counter() - t1
        t2 = time.perf_counter()
        force(qs["similarity_graph_insert_recall"].builder(spark, SF10))
        recall = time.perf_counter() - t2
        print(
            json.dumps(
                {
                    "kind": kind,
                    "cores": cores,
                    "first_touch_s": round(first, 1),
                    "routed_rerun_s": round(routed, 1),
                    "insert_recall_same_session_s": round(recall, 1),
                }
            )
        )
    spark.stop()


def main() -> None:
    if "--point" in sys.argv:
        i = sys.argv.index("--point")
        run_point(sys.argv[i + 1], int(sys.argv[i + 2]))
        return
    if not os.path.isdir(SF10):
        print("build /tmp/sfcurve100 first: python scripts/scale_curve_100x.py")
        sys.exit(1)
    for cores in (8, 16, 32):
        subprocess.run(
            [sys.executable, __file__, "--point", "build", str(cores)],
            check=True,
        )
    subprocess.run(
        [sys.executable, __file__, "--point", "insert", "32"], check=True
    )


if __name__ == "__main__":
    main()
