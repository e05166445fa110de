"""Benchmark runner (driver contract).

Runs the bench-tagged headline queries from the registry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced with a noop write (full execution, no driver
collect overhead). One warm-up run of the flagship amortizes JVM/codegen
startup so numbers reflect steady-state plan execution.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stream_processing_project_spark.plans.registry import all_queries  # noqa: E402
from stream_processing_project_spark.session import default_sf_dir, get_spark  # noqa: E402


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = default_sf_dir()
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")

    bench_queries = {
        n: q for n, q in sorted(all_queries().items()) if "bench" in q.tags
    }

    # warm-up: JVM, codegen, parquet footer reads
    warm = next(iter(bench_queries.values()))
    force(warm.builder(spark, sf_dir))

    timings: dict[str, float] = {}
    for name, q in bench_queries.items():
        t0 = time.perf_counter()
        force(q.builder(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "batch_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
