"""Custom stateful streaming operator: streaming sessionization with
``applyInPandasWithState``.

The batch :class:`~smashed_spark.functions.sessions.SessionizeMapper`
needs the whole history per user; on an unbounded stream the state is
instead carried by the engine's GroupState — per user we keep
(last event time, current session index, session start, running count)
and emit one row per CLOSED session.  Sessions close when the
inactivity gap exceeds ``gap_minutes``, enforced both by incoming
events and by processing-time state timeouts (so idle users eventually
flush).

Scale: state is partitioned by user (the group key) — the same hash
shuffle the batch version needs, but with O(users) state instead of
O(events) history.
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# state tuple: (last_ts_epoch_us, session_start_epoch_us, n_events,
#               total_value)
STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("start_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_field: str = "user_id",
    ts_field: str = "ts",
    value_field: str = "value",
    idle_timeout: "bool | str" = True,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Emit one row per closed session from a streaming events frame.

    ``idle_timeout`` selects how idle users' open sessions flush:

    * ``"event"`` — the recommended mode: an **event-time** state
      timeout at ``last_event + gap``.  Deterministic (driven by the
      watermark, i.e. by the DATA — a replay of the same events closes
      the same sessions at the same points), requires
      ``watermark_delay`` for the input watermark, and terminates
      cleanly under ``trigger(availableNow=True)`` because the engine
      only needs the trailing no-data batch to evaluate watermark
      timeouts — no forever-rescheduling, no polling.
    * ``True`` / ``"processing"`` — a processing-time timeout
      (wall-clock after the last batch that touched the user).
      Nondeterministic by nature; kept for parity with engines whose
      sessionization flushes on wall-clock idleness.  A bounded replay
      cannot settle on its own in this mode (every micro-batch
      re-evaluates future wall-clock timeouts).
    * ``False`` — no timeouts: only gap-closed sessions are emitted;
      bounded replays terminate under ``availableNow`` (the
      sentinel-closed gate pattern).
    """
    if idle_timeout is True:
        idle_timeout = "processing"
    if idle_timeout not in (False, "processing", "event"):
        raise ValueError(
            f"idle_timeout must be False, 'processing' or 'event', "
            f"got {idle_timeout!r}"
        )
    gap_us = gap_minutes * 60 * 1_000_000

    def update(
        key: Tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            if state.exists:
                last_us, start_us, n, total = state.get
                rows.append((user_id, start_us, last_us, n, total))
                state.remove()
        else:
            events_ts = []
            for pdf in batches:
                for ts, value in zip(pdf[ts_field], pdf[value_field]):
                    events_ts.append(
                        (int(pd.Timestamp(ts).value // 1000), float(value))
                    )
            events_ts.sort()
            if state.exists:
                last_us, start_us, n, total = state.get
            else:
                last_us, start_us, n, total = None, None, 0, 0.0
            for ts_us, value in events_ts:
                if last_us is not None and ts_us - last_us > gap_us:
                    rows.append((user_id, start_us, last_us, n, total))
                    start_us, n, total = ts_us, 0, 0.0
                if start_us is None:
                    start_us = ts_us
                last_us = ts_us
                n += 1
                total += value
            if last_us is not None:
                state.update((last_us, start_us, n, total))
                if idle_timeout == "processing":
                    state.setTimeoutDuration(gap_minutes * 60 * 1000)
                elif idle_timeout == "event":
                    # flush when the WATERMARK passes last_event + gap:
                    # event-time idleness, not wall-clock.  Spark
                    # rejects a timeout at/behind the current
                    # watermark, so clamp just past it (the session is
                    # then already gap-expired and flushes at the next
                    # timeout evaluation).
                    timeout_ms = (last_us + gap_us) // 1000
                    wm_ms = state.getCurrentWatermarkMs()
                    state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))
        if not rows:  # nothing closed this batch: yield no frame
            return
        out = pd.DataFrame(
            rows,
            columns=[
                "user_id",
                "start_us",
                "end_us",
                "n_events",
                "total_value",
            ],
        )
        out["session_start"] = pd.to_datetime(out["start_us"], unit="us")
        out["session_end"] = pd.to_datetime(out["end_us"], unit="us")
        yield out[
            ["user_id", "session_start", "session_end", "n_events", "total_value"]
        ]

    from ..core.ship import ensure_shipped

    ensure_shipped(events.sparkSession)
    if idle_timeout == "event":
        # EventTimeTimeout requires an event-time watermark on the input
        events = events.withWatermark(ts_field, watermark_delay)
    timeout_conf = {
        "event": GroupStateTimeout.EventTimeTimeout,
        "processing": GroupStateTimeout.ProcessingTimeTimeout,
        False: GroupStateTimeout.NoTimeout,
    }[idle_timeout]
    return events.groupBy(user_field).applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def run_sessionize_bounded(
    stream: DataFrame,
    query_name: str,
    gap_minutes: int = 30,
    timeout_seconds: float = 120.0,
) -> None:
    """Sessionize a *bounded* replay into the configured bounded sink
    (memory by default; ``SMASHED_STREAM_SINK=parquet`` for the
    production file-sink path — see ``runner.drain_bounded``) and
    return when the stream is exhausted.

    Uses ``idle_timeout=False`` + ``trigger(availableNow=True)``: the
    query processes everything available and terminates by itself — no
    polling loop, no forced ``stop()`` mid-batch, no task-abort log
    noise, and the checkpoint is removed only after clean termination.
    Only gap-closed sessions are emitted; callers that need every
    session closed should append a per-user sentinel event past the
    gap before replaying (see the ``stream_sessionize`` gate query).
    """
    from .runner import drain_bounded

    spark = stream.sparkSession
    # a bounded replay with NoTimeout state never needs the trailing
    # no-data micro-batch (it exists to advance watermarks/timeouts)
    nd_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    nd_prev = spark.conf.get(nd_key)
    spark.conf.set(nd_key, "false")
    sessions = streaming_sessionize(
        stream, gap_minutes=gap_minutes, idle_timeout=False
    )
    try:
        drain_bounded(
            sessions, query_name, timeout_seconds=timeout_seconds
        )
    finally:
        spark.conf.set(nd_key, nd_prev)


def run_sessionize_event_time(
    stream: DataFrame,
    query_name: str,
    gap_minutes: int = 30,
    watermark_delay: str = "1 minute",
    timeout_seconds: float = 120.0,
) -> None:
    """Sessionize a *bounded* replay with **event-time** idle timeouts
    into the configured bounded sink (see ``runner.drain_bounded``)
    and return when the stream is exhausted.

    ``idle_timeout="event"`` + ``trigger(availableNow=True)``: data
    batches emit gap-closed sessions; the trailing no-data micro-batch
    (required — do NOT disable ``noDataMicroBatches``) advances the
    watermark to ``max(ts) - watermark_delay`` and fires the
    event-time timeouts, flushing every open session whose
    ``last_event + gap`` the watermark passed.  Then the query
    terminates on its own.  This retires the poll-based runner the
    ProcessingTimeTimeout mode needed (that mode never settles under
    ``availableNow`` — the engine reschedules forever to evaluate
    future wall-clock timeouts); event-time timeouts are evaluated
    against the watermark, which is frozen once the data ends, so
    termination is well-defined and the flush set is a pure function
    of the data.
    """
    from .runner import drain_bounded

    sessions = streaming_sessionize(
        stream,
        gap_minutes=gap_minutes,
        idle_timeout="event",
        watermark_delay=watermark_delay,
    )
    drain_bounded(sessions, query_name, timeout_seconds=timeout_seconds)
