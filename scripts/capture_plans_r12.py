"""Capture .explain('formatted') for every bench-tagged query (and any
names passed with --only a,b,c) into plans/r12/<name>_<suffix>.txt, plus
a one-line-per-query plan-shape audit (Exchange count, join strategies,
Python eval nodes, scans) on stdout.

Usage:
    python scripts/capture_plans_r12.py before          # all bench queries
    python scripts/capture_plans_r12.py after --only cdc_upsert_materialize
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_processing_project_spark.plans.registry import all_queries  # noqa: E402
from stream_processing_project_spark.session import default_sf_dir, get_spark  # noqa: E402


def plan_audit(plan: str) -> dict:
    def count(pat: str) -> int:
        return len(re.findall(pat, plan))

    return {
        "exchange": count(r"\bExchange\b"),
        "reused_exchange": count(r"ReusedExchange"),
        "smj": count(r"SortMergeJoin"),
        "bhj": count(r"BroadcastHashJoin"),
        "shj": count(r"ShuffledHashJoin"),
        "bnlj": count(r"BroadcastNestedLoopJoin"),
        "cartesian": count(r"CartesianProduct"),
        "sort": count(r"\bSort\b"),
        "window": count(r"\bWindow\b|RunningWindowFunction"),
        "py_eval": count(r"BatchEvalPython|ArrowEvalPython"),
        "map_py": count(r"MapInPandas|PythonMapInArrow|FlatMapGroupsInPandas"),
        "scan": count(r"Scan parquet|FileScan"),
        "agg": count(r"HashAggregate|ObjectHashAggregate|SortAggregate"),
    }


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    sf_dir = default_sf_dir()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans-r12")
    qs = {
        n: q
        for n, q in sorted(all_queries().items())
        if (only and n in only) or (not only and "bench" in q.tags)
    }
    for name, q in qs.items():
        df = q.builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        a = plan_audit(plan)
        flags = " ".join(f"{k}={v}" for k, v in a.items() if v)
        print(f"{name:38s} {flags}")
    spark.stop()


if __name__ == "__main__":
    main()
