"""Full-registry runtime smoke at sf0.1 — the scale-regression net.

Runs EVERY registered query at one scale factor above the correctness
gate and reports per-query wall time plus any errors. Catches the class
of defect the sf0.01 oracle gate can't see: plans that are correct but
pathological at scale. This net caught (r02): the refine pipeline's
exponential predicate-pushdown inlining (minutes of codegen), the
winnowing fingerprint table re-hashing every document per window
position per reference (8+ min each), the oracled ANN twins re-running
the quantize transform per element access (33 s / 18 s), and
dedup_semantic_keep's connected-components non-convergence on the
higher-diameter sf0.1 pair graph.

    python scripts/smoke_sf01.py          # ~5 min on local[32]

Review the SLOWEST table: anything > ~10 s deserves a plan audit
(PLANS.md records the known costs; the usual suspect is a
higher-order-function alias consumed by another lambda or a pushed
filter — materialize it).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.shuffle.partitions", "32")
    .appName("smoke-sf01")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.1")

times: dict[str, tuple[float, int]] = {}
errs: list[tuple[str, str]] = []
from stream_processing_project_spark.plans import extensions as _ext

for name, fn in e.queries().items():
    # graph cache discipline (see scripts/scale_curve.py): the build
    # query always pays its real cost; dependents ride the session
    # cache and report serving-only
    if name == "similarity_nn_descent_graph":
        _ext._NN_GRAPH_CACHE.clear()
    t0 = time.perf_counter()
    try:
        n = fn(spark, SF_DIR).count()
        times[name] = (round(time.perf_counter() - t0, 2), n)
        print(f"DONE {times[name][0]:8.2f}s {name}", flush=True)
    except Exception as ex:  # noqa: BLE001 — smoke must survive to report
        errs.append((name, str(ex).splitlines()[0][:200]))
        print(f"ERR  {name}: {errs[-1][1]}", flush=True)

print("=== SLOWEST ===")
for name, (t, n) in sorted(times.items(), key=lambda kv: -kv[1][0])[:15]:
    print(f"{t:8.2f}s  {n:>9}  {name}")
print("errs:", errs)
sys.exit(1 if errs else 0)
