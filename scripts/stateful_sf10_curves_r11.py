"""Second-decade (sf1 -> sf10) curves for the stateful-streaming family
(VERDICT r10 task 6): streaming_scd2_enrich, streaming_upsert_materialize,
streaming_stateful_running_totals (re-point), cdc_upsert_materialize.
State-store scaling is where 100x bites streaming; the session-window
pair got its decade in r07/r08 (PLANS.md 'Task 2'), these four had only
first-decade numbers.

Method per the r07 lesson: queries whose ANSWER scales with the corpus
are driven into a noop/distributed sink — a memory-sink collect of a
10M-row result measures the harness, not the operator. One (query, sf)
point per process (state/conf isolation), parent loops via subprocess.

    python scripts/scale_curve.py         # /tmp/sfcurve2  (sf1)
    python scripts/scale_curve_100x.py    # /tmp/sfcurve100 (sf10)
    python scripts/stateful_sf10_curves_r11.py
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1, SF10 = "/tmp/sfcurve2", "/tmp/sfcurve100"
QUERIES = [
    "streaming_scd2_enrich",
    "streaming_upsert_materialize",
    "streaming_stateful_running_totals",
    "cdc_upsert_materialize",
]


def run_point(query: str, sf_dir: str) -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("stateful-sf10-r11")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from stream_processing_project_spark.streaming import pipeline

    t0 = time.time()
    if query == "streaming_scd2_enrich":
        # operator cost: the registered memory-sink return at sf10 is a
        # 10M-row driver collect — drive the same stream-static SCD2
        # join into noop instead (the builder minus run_to_completion)
        from pyspark.sql import functions as F

        cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
        cut = F.timestamp_micros(
            F.lit(1704067200000000)
            + (F.col("c_custkey") * F.lit(2654435761))
            % F.lit(4294967296)
            % F.lit(30)
            * F.lit(86400000000)
        )
        v1 = cust.select(
            "c_custkey",
            F.concat("c_mktsegment", F.lit("/v1")).alias("segment_v"),
            F.lit(1).alias("version"),
            F.timestamp_micros(F.lit(946684800000000)).alias("valid_from"),
            cut.alias("valid_to"),
        )
        v2 = cust.select(
            "c_custkey",
            F.concat("c_mktsegment", F.lit("/v2")).alias("segment_v"),
            F.lit(2).alias("version"),
            cut.alias("valid_from"),
            F.timestamp_micros(F.lit(4102444800000000)).alias("valid_to"),
        )
        dim = v1.unionByName(v2)
        events = pipeline.file_event_stream(spark, sf_dir)
        joined = events.join(
            F.broadcast(dim),
            (events.user_id == dim.c_custkey)
            & (events.ts >= dim.valid_from)
            & (events.ts < dim.valid_to),
            "left_outer",
        ).select(
            "event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
            "segment_v", "version",
        )
        q = (
            joined.writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", pipeline.checkpoint_dir("sf10scd2"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        n = -1
    elif query == "streaming_stateful_running_totals":
        from stream_processing_project_spark.operators.stateful import (
            running_totals_stream,
        )

        events = pipeline.cdc_event_stream(spark, sf_dir, min_partitions=16)
        out = running_totals_stream(events)
        q = (
            out.writeStream.outputMode("update")
            .format("noop")
            .option("checkpointLocation", pipeline.checkpoint_dir("sf10rt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        n = -1
    else:
        # upsert pair: the builders' sinks are already distributed
        # (foreachBatch parquet MERGE / batch plan); count, not collect,
        # forces the final state read
        from stream_processing_project_spark.plans.registry import get

        n = get(query).builder(spark, sf_dir).count()
    dt = time.time() - t0
    print(
        "POINT "
        + json.dumps(
            {"query": query, "sf_dir": sf_dir, "sec": round(dt, 1), "rows": n}
        ),
        flush=True,
    )


def main() -> None:
    if "--point" in sys.argv:
        i = sys.argv.index("--point")
        q, sf = sys.argv[i + 1 : i + 3]
        run_point(q, sf)
        return
    for q in QUERIES:
        for sf in (SF1, SF10):
            subprocess.run(
                [sys.executable, __file__, "--point", q, sf], check=False
            )


if __name__ == "__main__":
    main()
