"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference streaming CDC fan-out pipeline
(Habyali/stream-processing-project), re-expressed Spark-first.

Layout:
  session     — SparkSession factory tuned for local[N] and cluster scale
  schemas     — central schema registry (the reference has 4 ad-hoc copies;
                see SURVEY.md §1.2)
  sources/    — batch + streaming sources (parquet fixtures, CDC envelope,
                kafka-ready options)
  operators/  — enrichment join, windowed aggregation, top-k, monitor
                analytics, dedup, similarity, text analysis, multimodal
  functions/  — scalar column-expression surface (SURVEY.md §2.6)
  plans/      — the named query registry consumed by __spark_entry__.py
  streaming/  — Structured Streaming pipeline + sinks (SURVEY.md §2.5)
"""

__version__ = "0.1.0"
