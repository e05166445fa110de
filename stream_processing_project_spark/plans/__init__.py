from stream_processing_project_spark.plans.registry import (
    Query,
    all_queries,
    get,
    oracles,
    queries,
    register,
)
