"""Live pipeline monitor CLI — start the three-sink fan-out over the
fixture stream and render the operational dashboard until Ctrl-C
(the reference's monitor.py + stress_test.py stage loop, Spark-side).

    python scripts/monitor.py [sf_dir] [interval_s]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    interval = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0

    from pyspark.sql import functions as F

    from stream_processing_project_spark.monitor import monitor_loop
    from stream_processing_project_spark.session import get_spark
    from stream_processing_project_spark.sources.fixtures import load_table
    from stream_processing_project_spark.streaming import pipeline, sinks

    spark = get_spark("monitor")
    spark.sparkContext.setLogLevel("ERROR")

    events = pipeline.file_event_stream(spark, sf_dir)
    enriched = pipeline.enriched_stream(events, load_table(spark, sf_dir, "customer"))
    agg = (
        events.withWatermark("ts", "15 minutes")
        .groupBy(F.col("event_type").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_val"))
    )
    serving = tempfile.mkdtemp(prefix="mon-serving-")
    warehouse = tempfile.mkdtemp(prefix="mon-warehouse-")
    search = tempfile.mkdtemp(prefix="mon-search-")
    queries = sinks.start_fanout(enriched, agg, serving, warehouse, search)
    n_source = load_table(spark, sf_dir, "events").count()
    try:
        monitor_loop(
            spark,
            serving,
            warehouse,
            search,
            interval_s=interval,
            queries=queries,
            source_count_fn=lambda: n_source,
        )
    except KeyboardInterrupt:
        pass
    finally:
        for q in queries:
            q.stop()


if __name__ == "__main__":
    main()
