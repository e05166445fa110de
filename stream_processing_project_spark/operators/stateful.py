"""Custom stateful streaming operators via applyInPandasWithState.

The reference keeps per-key running counters in Redis across flushes
(EngagementRedisSink.scala:132-148: HINCRBY/ZINCRBY accumulate forever
until TTL eviction) — cumulative state that outlives any window. Spark's
built-in windowed aggregations can't express "running total since the
beginning of the stream, emitted on every update", so this is the one
reference semantic that genuinely needs the arbitrary-state API:
`applyInPandasWithState` (Arrow-batched per-group pandas with a
GroupState handle — the scalable path; state shards across executors
with the groupBy shuffle, and the optional processing-time timeout is
the 900 s Redis TTL analogue, EngagementRedisSink.scala:22).

Scale notes: state per key is two scalars (n, total) — state-store size
is O(|keys|), unaffected by event volume; each micro-batch shuffles only
that batch's rows on the group key. At 100 TB the lever is key
cardinality, not event count.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _accumulate(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one key into (n, total) state and
    emit the cumulative value. Runs executor-side over Arrow batches."""
    if state.hasTimedOut:
        state.remove()
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())  # skipna, matches SQL SUM
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_totals_stream(events: DataFrame, ttl: bool = False) -> DataFrame:
    """Per-user running (n_events, total_value) since stream start,
    emitted on every micro-batch that touches the user — the Redis
    cumulative-counter semantic (A11-adjacent) as an arbitrary-state op.
    ttl=True arms a processing-time timeout (state eviction à la the
    reference's EXPIRE 900) — off for deterministic tests."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _accumulate,
        RUNNING_TOTALS_SCHEMA,
        _STATE_SCHEMA,
        "update",
        timeout,
    )
