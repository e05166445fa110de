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
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
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


# --- transformWithState (Spark 4 arbitrary-state API) -------------------------

EVENT_TYPE_COUNTS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("cnt", LongType()),
    ]
)


def _make_event_type_counts_processor():
    """Build the StatefulProcessor subclass lazily so importing this
    module never hard-requires the Spark 4 transformWithState API."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class EventTypeCounts(StatefulProcessor):
        """Per-user hash of event_type → cumulative count, kept in
        MapState — the reference's Redis HINCRBY hash semantic
        (EngagementRedisSink.scala:132-139) on the modern
        transformWithState API. Each micro-batch folds its rows into the
        map and re-emits the user's full breakdown. MapState reads/writes
        touch ONLY the keys in the batch (vs ValueState, which would
        round-trip the whole dict per update) — with per-key state
        growing with the event-type vocabulary, that's the difference
        between O(batch keys) and O(vocabulary) state I/O per
        micro-batch. Map keys and values travel as 1-tuples (struct
        rows)."""

        def init(self, handle) -> None:
            self.counts = handle.getMapState(
                "counts", "event_type string", "cnt bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            batch: dict[str, int] = {}
            for pdf in rows:
                for et, c in pdf.groupby("event_type").size().items():
                    batch[et] = batch.get(et, 0) + int(c)
            for et, c in batch.items():
                cur = (
                    self.counts.getValue((et,))[0]
                    if self.counts.containsKey((et,))
                    else 0
                )
                self.counts.updateValue((et,), (cur + c,))
            pairs = [(k[0], v[0]) for k, v in self.counts.iterator()]
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(pairs),
                    "event_type": [et for et, _ in pairs],
                    "cnt": [c for _, c in pairs],
                }
            )

        def close(self) -> None:
            pass

    return EventTypeCounts()


def event_type_counts_stream(events: DataFrame) -> DataFrame:
    """Cumulative per-(user, event_type) counts via
    `transformWithStateInPandas` — state shards with the groupBy shuffle
    exactly like applyInPandasWithState, but the typed-state handles
    (Value/List/Map + timers) compose and scale to RocksDB-backed
    stores."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_event_type_counts_processor(),
        outputStructType=EVENT_TYPE_COUNTS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


TRANSITION_LOG_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("prev_type", StringType()),
        StructField("next_type", StringType()),
    ]
)

_LAST_EVENT_SCHEMA = StructType(
    [
        StructField("tu", LongType()),
        StructField("eid", LongType()),
        StructField("etype", StringType()),
    ]
)


def _emit_transitions(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit one (prev, next) row per consecutive event of this user,
    BRIDGING micro-batch boundaries through the stored last event —
    the sequence join a stateless stream cannot express. Rows within
    the batch are ordered by the (ts, event_id) total key; arrival is
    assumed in-order across batches (the Kafka-per-key guarantee; an
    out-of-order source needs an event-time buffer in front)."""
    if state.hasTimedOut:
        state.remove()
        return
    pdf = pd.concat(list(pdfs), ignore_index=True)
    if len(pdf) == 0:
        return
    pdf = pdf.sort_values(["tu", "event_id"], kind="mergesort")
    types = pdf["event_type"].tolist()
    prevs, nexts = [], []
    if state.exists:
        _, _, last_type = state.get
        prevs.append(last_type)
        nexts.append(types[0])
    prevs.extend(types[:-1])
    nexts.extend(types[1:])
    last = pdf.iloc[-1]
    state.update((int(last["tu"]), int(last["event_id"]), str(last["event_type"])))
    if prevs:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(prevs),
                "prev_type": prevs,
                "next_type": nexts,
            }
        )


def transition_log_stream(events: DataFrame) -> DataFrame:
    """Per-user event-transition log as an arbitrary-state streaming op:
    state is ONE row per user (its last event), so the state store is
    O(|users|) regardless of stream length, and each emitted row is a
    consecutive-pair observation ready for downstream counting."""
    from pyspark.sql import functions as F

    keyed = events.select(
        "user_id",
        F.unix_micros("ts").alias("tu"),
        F.col("event_id"),
        "event_type",
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _emit_transitions,
        TRANSITION_LOG_SCHEMA,
        _LAST_EVENT_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


BUCKET_FIRST_SEEN_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("band_idx", LongType()),
        StructField("first_seen", LongType()),
    ]
)

_BUCKET_STATE_SCHEMA = StructType([StructField("min_id", LongType())])


def _emit_bucket_first_seen(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per LSH bucket (band_idx, band_hash): running-min doc_id state;
    each arriving doc emits the smallest PRIOR doc sharing its bucket
    (NULL when it is the bucket's first) — the online near-dup verdict.
    In-batch rows order by doc_id; arrival is assumed id-ordered across
    batches (the transition-log convention)."""
    if state.hasTimedOut:
        state.remove()
        return
    pdf = pd.concat(list(pdfs), ignore_index=True)
    if len(pdf) == 0:
        return
    pdf = pdf.sort_values("doc_id", kind="mergesort")
    prior = int(state.get[0]) if state.exists else None
    firsts = []
    for did in pdf["doc_id"].tolist():
        firsts.append(prior)
        prior = int(did) if prior is None else min(prior, int(did))
    state.update((int(prior),))
    yield pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].tolist(),
            "band_idx": pdf["band_idx"].astype("int64").tolist(),
            "first_seen": pd.array(firsts, dtype="Int64"),
        }
    )


def bucket_first_seen_stream(bands: DataFrame) -> DataFrame:
    """Streaming online near-dup primitive: state is ONE long per LSH
    bucket (min doc_id), sharded across executors by the bucket-key
    shuffle — O(|buckets|) state regardless of stream length. Compose
    with a per-doc aggregation of the emitted verdicts for the
    keep/drop decision (plans/streaming_queries.py::
    streaming_dedup_minhash)."""
    return bands.groupBy("band_idx", "band_hash").applyInPandasWithState(
        _emit_bucket_first_seen,
        BUCKET_FIRST_SEEN_SCHEMA,
        _BUCKET_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


EWMA_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ewma_cents", DoubleType()),
    ]
)

_EWMA_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("acc", DoubleType())]
)

_EWMA_ALPHA = 0.25


def _fold_ewma(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Left-fold this micro-batch's rows (ordered by the (ts, event_id)
    total key) into the user's EWMA state: acc = α·x + (1−α)·acc,
    seeded by the first observation. The fold runs in plain Python
    floats — the SAME fixed sequence of IEEE double ops the oracle's
    list_reduce performs, so batch parity is bit-exact. Bridges
    micro-batch boundaries through the stored (n, acc); in-order
    arrival across batches is the transition-log assumption
    (`_emit_transitions`)."""
    if state.hasTimedOut:
        state.remove()
        return
    pdf = pd.concat(list(pdfs), ignore_index=True)
    if len(pdf) == 0:
        return
    pdf = pdf.sort_values(["tu", "event_id"], kind="mergesort")
    n, acc = state.get if state.exists else (0, 0.0)
    for x in pdf["cents"].tolist():
        x = float(x)
        if n == 0:
            acc = x
        else:
            acc = _EWMA_ALPHA * x + (1.0 - _EWMA_ALPHA) * acc
        n += 1
    state.update((n, acc))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "ewma_cents": [acc]}
    )


def ewma_stream(events: DataFrame) -> DataFrame:
    """Per-user EWMA of event value as TRUE sequential state — the
    recurrence e_i = α·x_i + (1−α)·e_{i−1} that batch window algebra
    cannot partial-aggregate (contrast `timeseries_ewma_smooth`, which
    scales by truncating the memory to K lags; this keeps infinite
    memory with O(1) state per key). State is two scalars per user —
    store size O(|users|), sharded with the groupBy shuffle; each
    micro-batch folds only its own rows. The streaming twin of the
    monitor's smoothed rate series."""
    from pyspark.sql import functions as F

    keyed = events.select(
        "user_id",
        F.unix_micros("ts").alias("tu"),
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _fold_ewma,
        EWMA_SCHEMA,
        _EWMA_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


OLS_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("updates", LongType()),
        StructField("n", LongType()),
        StructField("slope", DoubleType()),
        StructField("intercept", DoubleType()),
    ]
)

# (updates, max_x, n, sx, sy, sxx, sxy) — O(1) integers per key
_OLS_STATE_SCHEMA = StructType(
    [
        StructField("updates", LongType()),
        StructField("max_x", LongType()),
        StructField("n", LongType()),
        StructField("sx", LongType()),
        StructField("sy", LongType()),
        StructField("sxx", LongType()),
        StructField("sxy", LongType()),
    ]
)


def _fold_ols(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's (hour x, cents) rows into the series'
    OLS sufficient statistics: Σy and Σxy grow with EVERY batch (late
    cents for an already-seen hour just add), while n, Σx, Σx² grow
    only when a NEW hour appears (x > max_x — in-order hour arrival,
    the transition-log assumption). Coefficients assemble in the SAME
    fixed order as the batch oracle (slope = num/det first, then
    intercept = (Σy − slope·Σx)/n) over the same exact int64 sums, so
    parity is bit-exact. `updates` strictly increases per emission —
    the run_to_completion reader keeps the last row per key."""
    if state.hasTimedOut:
        state.remove()
        return
    pdf = pd.concat(list(pdfs), ignore_index=True)
    if len(pdf) == 0:
        return
    agg = pdf.groupby("x", sort=True)["cents"].sum()
    upd, max_x, n, sx, sy, sxx, sxy = (
        state.get if state.exists else (0, -(1 << 62), 0, 0, 0, 0, 0)
    )
    for x, c in agg.items():
        x, c = int(x), int(c)
        if x > max_x:
            n += 1
            sx += x
            sxx += x * x
            max_x = x
        sy += c
        sxy += x * c
    upd += 1
    state.update((upd, max_x, n, sx, sy, sxx, sxy))
    det = n * sxx - sx * sx
    if det > 0:
        slope = float(n * sxy - sx * sy) / float(det)
        intercept = (float(sy) - slope * float(sx)) / float(n)
    else:
        slope = None
        intercept = None
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "updates": [upd],
            "n": [n],
            "slope": [slope],
            "intercept": [intercept],
        }
    )


def ols_stream(events: DataFrame, origin: int) -> DataFrame:
    """Per-series INCREMENTAL least-squares fit — the streaming twin of
    `timeseries_linear_forecast`, and the payoff of designing the batch
    op around sufficient statistics: because (n, Σx, Σy, Σx², Σxy) are
    associative integers, the same fit streams with O(1) state per key
    and no window buffers. Each micro-batch pre-aggregates its rows to
    per-hour cents (Arrow-batched pandas groupby — batch-local, tiny),
    folds them into the state, and emits the refreshed coefficients.
    State store: 7 longs per series."""
    from pyspark.sql import functions as F

    keyed = events.select(
        "event_type",
        ((F.unix_seconds(F.col("ts")) / 3600).cast("long") - origin).alias("x"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return keyed.groupBy("event_type").applyInPandasWithState(
        _fold_ols,
        OLS_SCHEMA,
        _OLS_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


PIT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("label_event_id", LongType()),
        StructField("label_tu", LongType()),
        StructField("n_prior", LongType()),
        StructField("cents_prior", LongType()),
    ]
)

_PIT_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("cents", LongType())]
)


def _fold_pit(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Walk this micro-batch's rows in the (ts, tag DESC, event_id)
    total order: a label row (tag 1) EMITS the accumulated feature
    state BEFORE any same-timestamp feature folds in (the strictly-
    before leakage rule, encoded in the sort exactly as the batch
    window's `tag DESC, 1 PRECEDING` frame); a feature row (tag 0)
    then folds into (n, cents). State bridges micro-batches — the
    online store's running profile."""
    if state.hasTimedOut:
        state.remove()
        return
    pdf = pd.concat(list(pdfs), ignore_index=True)
    if len(pdf) == 0:
        return
    pdf = pdf.sort_values(
        ["tu", "tag", "event_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    n, cents = state.get if state.exists else (0, 0)
    out = []
    for tu, tag, eid, c in zip(
        pdf["tu"].tolist(), pdf["tag"].tolist(),
        pdf["event_id"].tolist(), pdf["cents"].tolist(),
    ):
        if tag == 1:
            out.append((key[0], int(eid), int(tu), n, cents))
        else:
            n += 1
            cents += int(c)
    state.update((n, cents))
    if out:
        yield pd.DataFrame(
            out,
            columns=["user_id", "label_event_id", "label_tu",
                     "n_prior", "cents_prior"],
        )


def pit_feature_stream(events: DataFrame) -> DataFrame:
    """ONLINE point-in-time feature serving — the streaming twin of
    `features_pit_join`, and the feature-store consistency claim made
    testable: the online path (running per-user state, features
    attached to each label the moment it arrives) and the offline path
    (the batch as-of window) are checked against the SAME oracle.
    State is two longs per user; each label costs O(1). In-order
    arrival per user across micro-batches is the transition-log
    convention."""
    from pyspark.sql import functions as F

    keyed = events.filter(
        F.col("event_type").isin("view", "click", "play", "purchase")
    ).select(
        "user_id",
        F.unix_micros("ts").alias("tu"),
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("tag"),
        F.when(
            F.col("event_type").isin("view", "click", "play"),
            F.round(F.col("value") * 100, 0).cast("long"),
        )
        .otherwise(0)
        .alias("cents"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _fold_pit,
        PIT_SCHEMA,
        _PIT_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


RETRACT_AGG_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_changes", LongType()),
        StructField("n_live", LongType()),
        StructField("sum_cents_live", LongType()),
    ]
)

# (n_changes, n_live, sum_cents) — O(1) integers per key
_RETRACT_STATE_SCHEMA = StructType(
    [
        StructField("n_changes", LongType()),
        StructField("n_live", LongType()),
        StructField("sum_cents", LongType()),
    ]
)


def _fold_retract(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's change rows into the group's live
    aggregate via the retraction algebra: +after for inserts,
    (after - before) for updates, -before for deletes. Pure integer
    sums — commutative and associative, so unlike the EWMA fold no
    within-batch ordering matters; micro-batch boundaries bridge
    through the three stored integers."""
    if state.hasTimedOut:
        state.remove()
        return
    pdf = pd.concat(list(pdfs), ignore_index=True)
    if len(pdf) == 0:
        return
    n_changes, n_live, sum_cents = state.get if state.exists else (0, 0, 0)
    for op, before, after in zip(
        pdf["op"].tolist(), pdf["before"].tolist(), pdf["after"].tolist()
    ):
        n_changes += 1
        if op == "c":
            n_live += 1
            sum_cents += int(after)
        elif op == "u":
            sum_cents += int(after) - int(before)
        else:  # d
            n_live -= 1
            sum_cents -= int(before)
    state.update((n_changes, n_live, sum_cents))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_changes": [n_changes],
            "n_live": [n_live],
            "sum_cents_live": [sum_cents],
        }
    )


def retract_stream(changes: DataFrame) -> DataFrame:
    """Retraction-aware streaming aggregate (the Flink retract-stream
    capability as arbitrary state): SUM/COUNT per group maintained
    from +after/-before deltas alone — O(1) state per key (three
    integers), no per-key version history, state sharded with the
    groupBy shuffle. The batch twin (`cdc_retract_aggregate`) proves
    the same algebra against the materialized-state oracle; this
    operator carries it across micro-batch boundaries. Input: rows
    (user_id, op, before, after) with op in {c, u, d}."""
    return changes.groupBy("user_id").applyInPandasWithState(
        _fold_retract,
        RETRACT_AGG_SCHEMA,
        _RETRACT_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --- stateful sessionization (event-time timeout) ------------------------------

SESSION_WINDOW_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("s0_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_val", DoubleType()),
    ]
)

# open sessions as parallel arrays: first/last event micros, event
# count, value sum — a user can legitimately hold SEVERAL open islands
# at once (out-of-order arrivals within the watermark create separate
# intervals that a later bridging event may merge), so the state is a
# set of intervals, not one
_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("s_us", ArrayType(LongType())),
        StructField("e_us", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
        StructField("sums", ArrayType(DoubleType())),
    ]
)

_SESSION_GAP_US = 30 * 60 * 1_000_000


def _merge_intervals(
    sess: list[list], events: list[tuple[int, float]], gap_us: int
) -> list[list]:
    """Fold (ts_us, value) points into the open-session interval set:
    sort everything by start, merge any interval whose start falls
    STRICTLY inside [start, last + gap) of its predecessor — the same
    half-open semantics as Spark's session_window (an event exactly
    gap after the last one starts a NEW session)."""
    items = [list(s) for s in sess] + [[us, us, 1, v] for us, v in events]
    items.sort(key=lambda s: (s[0], s[1]))
    out: list[list] = []
    for it in items:
        if out and it[0] < out[-1][1] + gap_us:
            cur = out[-1]
            cur[1] = max(cur[1], it[1])
            cur[2] += it[2]
            cur[3] += it[3]
        else:
            out.append(it)
    return out


def _sessionize(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user session assembly. Each invocation merges the batch's
    events into the open-interval state, emits every session the
    current watermark has CLOSED (last_event + gap <= watermark — the
    exact append-mode predicate of native session_window), and arms an
    event-time timer at the earliest possible close so the trailing
    no-data batch flushes sessions the final watermark passes."""
    wm_us = state.getCurrentWatermarkMs() * 1000
    sess = (
        [list(t) for t in zip(*state.get)] if state.exists and state.get[0] else []
    )
    if not state.hasTimedOut:
        batch: list[tuple[int, float]] = []
        for pdf in pdfs:
            pdf = pdf.dropna(subset=["ts"])
            us = (pdf["ts"].astype("datetime64[us]").astype("int64")).tolist()
            vals = pdf["value"].astype("float64").tolist()
            batch.extend(zip(us, vals))
        batch.sort()
        sess = _merge_intervals(sess, batch, _SESSION_GAP_US)
    closed = [s for s in sess if s[1] + _SESSION_GAP_US <= wm_us]
    kept = [s for s in sess if s[1] + _SESSION_GAP_US > wm_us]
    if kept:
        state.update(
            (
                [s[0] for s in kept],
                [s[1] for s in kept],
                [s[2] for s in kept],
                [s[3] for s in kept],
            )
        )
        next_close_ms = min(s[1] + _SESSION_GAP_US for s in kept) // 1000
        state.setTimeoutTimestamp(max(next_close_ms, wm_us // 1000 + 1))
    else:
        state.remove()
    if closed:
        # session start leaves Python as raw int64 micros — the string
        # render is JVM-side date_format in session_window_stream
        # (measured r08: per-session pd.Timestamp().strftime() in the
        # flush batch was ~25% of the sf10 wall)
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "s0_us": [s[0] for s in closed],
                "n_events": [s[2] for s in closed],
                "sum_val": [s[3] for s in closed],
            }
        )


def session_window_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Custom STATEFUL sessionization via applyInPandasWithState with an
    event-time timeout — the arbitrary-state twin of the native
    `session_window` path (streaming/pipeline.py::session_stream, batch
    twin plans/olap.py::olap_sessionize). Native session_window fixes
    the aggregate surface at gap-merge time; the stateful form is the
    extension point for session payloads Spark's merger can't express
    (distinct funnels, first/last-k events, per-session model state) —
    this implementation carries (count, value sum) to stay
    oracle-checkable. Reference anchor: the Redis sink's TTL-windowed
    per-key state (EngagementRedisSink.scala:132-201) is exactly a
    processing-time session; this is its event-time generalization.

    Scale shape: state shards with the groupBy(user) shuffle and holds
    only OPEN intervals per user (bounded by arrival disorder within
    the watermark, not by stream length); each emission is final
    (append mode), and the event-time timer bounds how long a quiet
    user's interval lingers. Timestamps are second-truncated before the
    watermark so closure arithmetic is exact cross-engine."""
    ev = events.select(
        "user_id", F.date_trunc("second", "ts").alias("ts"), "value"
    ).withWatermark("ts", watermark)
    out = ev.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        SESSION_WINDOW_SCHEMA,
        _SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    # vectorized JVM-side render of the session-start string (the UTC
    # container contract; fixture micros are second-truncated upstream)
    return out.select(
        "user_id",
        F.date_format(F.timestamp_micros(F.col("s0_us")), "yyyy-MM-dd HH:mm:ss")
        .alias("sess_start"),
        "n_events",
        "sum_val",
    )
