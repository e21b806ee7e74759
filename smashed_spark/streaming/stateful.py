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
    idle_timeout: bool = True,
) -> DataFrame:
    """Emit one row per closed session from a streaming events frame.

    ``idle_timeout=True`` (the unbounded-stream default) registers a
    processing-time state timeout so idle users eventually flush their
    open session.  ``idle_timeout=False`` disables timeouts entirely —
    only gap-closed sessions are emitted — which lets a *bounded*
    replay run under ``trigger(availableNow=True)`` and terminate on
    its own (with ProcessingTimeTimeout the engine keeps scheduling
    batches forever to evaluate future timeouts).
    """
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
                if idle_timeout:
                    state.setTimeoutDuration(gap_minutes * 60 * 1000)
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
    return events.groupBy(user_field).applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


def run_sessionize_bounded(
    stream: DataFrame,
    query_name: str,
    gap_minutes: int = 30,
    timeout_seconds: float = 120.0,
) -> None:
    """Sessionize a *bounded* replay into a memory sink and return when
    the stream is exhausted.

    Uses ``idle_timeout=False`` + ``trigger(availableNow=True)``: the
    query processes everything available and terminates by itself — no
    polling loop, no forced ``stop()`` mid-batch, no task-abort log
    noise, and the checkpoint is removed only after clean termination.
    Only gap-closed sessions are emitted; callers that need every
    session closed should append a per-user sentinel event past the
    gap before replaying (see the ``stream_sessionize`` gate query).
    """
    import shutil
    import tempfile

    checkpoint_dir = tempfile.mkdtemp(prefix="smashed_stream_ckpt_")
    spark = stream.sparkSession
    # a bounded replay with NoTimeout state never needs the trailing
    # no-data micro-batch (it exists to advance watermarks/timeouts)
    nd_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    nd_prev = spark.conf.get(nd_key)
    spark.conf.set(nd_key, "false")
    sessions = streaming_sessionize(
        stream, gap_minutes=gap_minutes, idle_timeout=False
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_seconds)
    finally:
        spark.conf.set(nd_key, nd_prev)
        if q.isActive:  # timed out: don't yank the checkpoint mid-commit
            q.stop()
            q.awaitTermination(30)
        if not q.isActive:
            shutil.rmtree(checkpoint_dir, ignore_errors=True)


def run_sessionize_to_memory(
    stream: DataFrame,
    query_name: str,
    gap_minutes: int = 30,
    poll_seconds: float = 1.0,
    stable_polls: int = 3,
    max_seconds: float = 120.0,
    checkpoint_dir: str | None = None,
) -> None:
    """Run streaming sessionization into a memory sink and stop once the
    output stabilizes.

    With ``ProcessingTimeTimeout`` state registered, neither
    ``availableNow`` termination nor ``processAllAvailable`` settles
    (the engine keeps scheduling batches to evaluate future timeouts),
    so completion is detected by polling the sink row count.

    An explicit checkpoint location is used (and removed only after the
    query has fully stopped): the default ``temporary-*`` checkpoint is
    deleted during ``stop()`` while state-store commits may still be
    in flight, which spews FileNotFoundException noise.

    With ``ProcessingTimeTimeout`` state the trigger is almost never
    idle (every micro-batch re-evaluates timeouts), so stopping will
    interrupt an in-flight batch; for this bounded replay that is
    intentional and harmless (memory sink, checkpoint discarded), and
    the expected task-abort log noise is silenced for just the
    teardown window, then the previous log level is restored.
    """
    import shutil
    import tempfile
    import time

    own_checkpoint = checkpoint_dir is None
    if own_checkpoint:
        checkpoint_dir = tempfile.mkdtemp(prefix="smashed_stream_ckpt_")
    sessions = streaming_sessionize(stream, gap_minutes=gap_minutes)
    q = (
        sessions.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="1 second")
        .start()
    )
    spark = stream.sparkSession
    try:
        last, stable, waited = -1, 0, 0.0
        while waited < max_seconds:
            time.sleep(poll_seconds)
            waited += poll_seconds
            n = (
                spark.sql(f"SELECT count(*) AS n FROM {query_name}")
                .collect()[0]
                .n
            )
            if n == last and n > 0:
                stable += 1
                if stable >= stable_polls:
                    break
            else:
                stable = 0
            last = n
    finally:
        sc = spark.sparkContext
        jvm = sc._jvm
        prev_level = (
            jvm.org.apache.logging.log4j.LogManager.getRootLogger()
            .getLevel()
            .toString()
        )
        sc.setLogLevel("OFF")
        try:
            q.stop()
            q.awaitTermination(30)
            time.sleep(0.3)  # let async task-abort logging drain
        finally:
            sc.setLogLevel(prev_level)
            # if the query is somehow still committing after the stop
            # timeout, leave the checkpoint on disk — deleting it
            # mid-commit reintroduces the FileNotFound noise
            if own_checkpoint and not q.isActive:
                shutil.rmtree(checkpoint_dir, ignore_errors=True)
