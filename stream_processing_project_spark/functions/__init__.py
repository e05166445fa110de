from stream_processing_project_spark.functions.scalar import (
    engagement_pct,
    engagement_seconds,
    log_line,
    minute_key,
    ts_iso_utc,
    ts_plain,
)
