"""Scalar column-expression surface (SURVEY.md §2.2 P4-P12, §2.6).

Everything the reference computes per-record in Scala is a pure Spark
column expression here — JVM-side, whole-stage-codegen'd, no Python in
the hot path. Each function cites the reference behavior it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def engagement_seconds(duration_ms: Column) -> Column:
    """P4 — duration_ms / 1000.0, null-propagating
    (reference: EngagementProcessor.scala:109)."""
    return duration_ms / 1000.0


def engagement_pct(duration_ms: Column, length_seconds: Column) -> Column:
    """P5 — round((duration_ms/1000 / length_seconds) * 100, 2); NULL if
    any input NULL or length_seconds <= 0
    (reference: EngagementProcessor.scala:111-116, Math.round half-up —
    Spark `round` is HALF_UP, parity pinned in tests)."""
    return F.when(
        length_seconds > 0,
        F.round(duration_ms / 1000.0 / length_seconds * 100.0, 2),
    )


def ratio_pct(numer: Column, denom: Column, scale: int = 2) -> Column:
    """Generalized P5 for the fixture tables: round(numer/denom*100, scale),
    NULL unless denom > 0."""
    return F.when(denom > 0, F.round(numer / denom * 100.0, scale))


def ts_plain(ts: Column) -> Column:
    """P9 — BigQuery-flavor timestamp cleanup: 'yyyy-MM-dd HH:mm:ss'
    (reference strips Z/T and fractional seconds per-record with string
    surgery, BigQuerySink.scala:174-186; here one codegen'd format)."""
    return F.date_format(ts, "yyyy-MM-dd HH:mm:ss")


def ts_iso_utc(ts: Column) -> Column:
    """P10 — Elasticsearch-flavor ISO-8601 UTC form
    (reference: ElasticsearchSink.scala:231-245)."""
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def minute_key(ts: Column, prefix: str) -> Column:
    """P12 — time-bucketed key '<prefix>:yyyyMMddHHmm'
    (reference Redis key scheme, EngagementRedisSink.scala:24,132-134)."""
    return F.concat(F.lit(prefix + ":"), F.date_format(ts, "yyyyMMddHHmm"))


def log_line(event_type: Column, key: Column, pct: Column) -> Column:
    """P8 — human log line with %.2f formatting and '?' fallback
    (reference: EngagementProcessor.scala:189-190 `getOrElse("?")`)."""
    return F.format_string(
        "%s key=%s pct=%s",
        event_type,
        F.coalesce(key, F.lit("?")),
        F.coalesce(F.format_string("%.2f", pct), F.lit("?")),
    )


def deterministic_sample(id_col: Column, percent: int) -> Column:
    """P7 — sampling predicate. The reference uses Random.nextInt(100) < rate
    (EngagementProcessor.scala:188); for oracle-reproducible tests we use a
    deterministic id-hash residue. Production streaming path uses F.rand()."""
    return F.pmod(id_col, F.lit(100)) < percent
