"""Operational pipeline monitor — the live-dashboard loop.

Reference: monitor.py:197-296 polls per-sink COUNT(*)s over the network
(Postgres/BigQuery/Elasticsearch), derives per-sink ingest rates from
consecutive polls, computes processing lag as source-minus-sink count,
and renders the Redis top-k boards; stress_test.py drives the same loop
per offered-load stage.

Spark-first: every number the reference scrapes remotely is local here —
sink tables are parquet paths Spark can count with metadata-only scans,
rates/state sizes come natively from StreamingQuery.lastProgress
(streaming/sinks.py::query_metrics), and the serving boards are the
snapshot table. The renderer is a pure function over a collected
Snapshot, so tests assert on its output without a terminal; the CLI
loop (scripts/monitor.py) just clears and reprints.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@dataclass
class Snapshot:
    """One poll of the pipeline: per-sink counts + serving boards."""

    ts: float
    warehouse_count: int
    search_count: int
    source_count: int
    boards: list[tuple[str, str, float, int]]  # (board, key, score, rank)
    query_metrics: list[dict] = field(default_factory=list)
    errors: dict[str, str] = field(default_factory=dict)


def _safe_count(spark: SparkSession, path: str, errors: dict, name: str) -> int:
    try:
        return spark.read.parquet(path).count()
    except Exception as exc:  # noqa: BLE001 — a missing sink is a dashboard row, not a crash
        errors[name] = str(exc).splitlines()[0][:80]
        return 0


def take_snapshot(
    spark: SparkSession,
    serving_path: str,
    warehouse_path: str,
    search_path: str,
    source_count: int = 0,
    queries: list | None = None,
) -> Snapshot:
    """Collect one poll. `source_count` is the number of events offered
    upstream (the reference's Postgres count); pass the generator's own
    counter, or leave 0 to suppress lag rows. `queries` are live
    StreamingQuery handles for native rate/state metrics."""
    from stream_processing_project_spark.streaming.sinks import query_metrics

    errors: dict[str, str] = {}
    wh = _safe_count(spark, warehouse_path, errors, "warehouse")
    se = _safe_count(spark, search_path, errors, "search")
    boards: list[tuple[str, str, float, int]] = []
    try:
        boards = [
            (r.board, r.key, float(r.score), int(r.rank))
            for r in spark.read.parquet(serving_path)
            .orderBy("board", "rank")
            .collect()
        ]
    except Exception as exc:  # noqa: BLE001
        errors["serving"] = str(exc).splitlines()[0][:80]
    qm = [query_metrics(q) for q in (queries or [])]
    return Snapshot(
        ts=time.time(),
        warehouse_count=wh,
        search_count=se,
        source_count=source_count,
        boards=boards,
        query_metrics=[m for m in qm if m],
        errors=errors,
    )


def rates(prev: Snapshot | None, cur: Snapshot) -> dict[str, float]:
    """Per-sink events/s between two polls (the reference's smoothing,
    monitor.py:224-231: clamp at 0, guard zero elapsed)."""
    if prev is None or cur.ts <= prev.ts:
        return {"warehouse": 0.0, "search": 0.0}
    dt = cur.ts - prev.ts
    return {
        "warehouse": max(0.0, (cur.warehouse_count - prev.warehouse_count) / dt),
        "search": max(0.0, (cur.search_count - prev.search_count) / dt),
    }


def render(cur: Snapshot, prev: Snapshot | None = None) -> str:
    """Plain-text dashboard frame: component table (count, rate, lag),
    the two serving boards, native streaming metrics, error lines."""
    r = rates(prev, cur)
    lines = [
        time.strftime("pipeline monitor  %H:%M:%S", time.localtime(cur.ts)),
        "source -> [serving | warehouse | search]",
        "",
        f"{'component':<12} {'events':>12} {'rate/s':>10} {'lag':>14}",
    ]

    def lag(n: int) -> str:
        if cur.source_count <= 0:
            return "-"
        behind = cur.source_count - n
        return f"{behind:,} behind" if behind > 0 else "caught up"

    if cur.source_count > 0:
        lines.append(f"{'source':<12} {cur.source_count:>12,} {'-':>10} {'-':>14}")
    lines.append(
        f"{'warehouse':<12} {cur.warehouse_count:>12,}"
        f" {r['warehouse']:>10.0f} {lag(cur.warehouse_count):>14}"
    )
    lines.append(
        f"{'search':<12} {cur.search_count:>12,}"
        f" {r['search']:>10.0f} {lag(cur.search_count):>14}"
    )
    for board in ("top_by_engagement", "top_by_access"):
        rows = [b for b in cur.boards if b[0] == board]
        if rows:
            lines.append("")
            lines.append(board)
            for _, key, score, rank in rows:
                lines.append(f"  {rank}. {key:<24} {score:12.2f}")
    for m in cur.query_metrics:
        lines.append("")
        lines.append(
            f"stream batch={m.get('batch_id')}"
            f" in_rows={m.get('num_input_rows')}"
            f" rate={m.get('processed_rows_per_second') or 0:.0f}/s"
            f" state_rows={m.get('state_rows_total')}"
        )
    for name, err in sorted(cur.errors.items()):
        lines.append(f"! {name}: {err}")
    return "\n".join(lines)


def monitor_loop(
    spark: SparkSession,
    serving_path: str,
    warehouse_path: str,
    search_path: str,
    interval_s: float = 2.0,
    iterations: int | None = None,
    queries: list | None = None,
    source_count_fn=None,
    out=print,
) -> None:
    """The reference's refresh loop (monitor.py:289-296): poll, render,
    clear, repeat. `iterations=None` runs until interrupted; tests pass
    a small number and a capturing `out`."""
    prev: Snapshot | None = None
    n = 0
    while iterations is None or n < iterations:
        cur = take_snapshot(
            spark,
            serving_path,
            warehouse_path,
            search_path,
            source_count=source_count_fn() if source_count_fn else 0,
            queries=queries,
        )
        out("\x1b[2J\x1b[H" + render(cur, prev) if out is print else render(cur, prev))
        prev = cur
        n += 1
        if iterations is None or n < iterations:
            time.sleep(interval_s)
