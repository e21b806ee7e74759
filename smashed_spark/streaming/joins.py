"""Watermarked stream-stream interval joins.

The enrichment shape a live training-data feed needs that the batch
as-of/range joins (functions/asof.py) cannot serve: match each left
event with right events whose event time falls in
``[left_ts - before, left_ts + after]``, over two UNBOUNDED streams
(impressions x clicks, documents x moderation verdicts, requests x
responses).

Spark-first design — the whole value of the helper is the state
contract:

* a stream-stream join buffers BOTH sides in state; without
  watermarks on both event-time columns AND a time-range condition
  relating them, that state grows forever (Spark accepts the inner
  join and OOMs later).  :func:`interval_join` always installs both,
  so state is provably bounded to the interval + watermark horizon
  and rows age out;
* outer variants emit the unmatched row only once the watermark
  passes its interval — late-data correctness the caller would
  otherwise hand-roll (and the reason results are append-mode clean);
* column hygiene: the two sides of a self-shaped join usually share
  names; colliding non-key columns RAISE (the house stance — a
  silent ``col`` / ``col`` ambiguity surfaces 200 TB later as a
  wrong-column read), with renames left to the caller where they are
  visible;
* the SAME call works on bounded batch frames (the join condition is
  ordinary column algebra; watermarks are no-ops in batch mode) —
  which is what the streaming-equals-batch tests pin.

Scale notes: the equi-keys drive the exchange exactly as a batch join
would; state per key is bounded by (interval width + watermark skew)
x arrival rate.  Size watermarks for true out-of-orderness — too
large only grows state linearly, too small drops genuine stragglers.

Operational trap (test-pinned in
tests/test_streaming_joins.py::test_interval_join_streaming_left_outer_emits_unmatched):
the GLOBAL watermark is the MIN over both streams' watermarks.  A
quiet side — a click stream that simply stops — pins the global
watermark at its last event, so no later interval ever closes and
outer rows stop emitting (state also stops expiring).  Production
feeds want heartbeat events on sparse streams, or
``spark.sql.streaming.multipleWatermarkPolicy=max`` with its
documented drop-risk trade-off.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_JOIN_MODES = ("inner", "left_outer", "right_outer", "full_outer")


def _with_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (not NTZ) — the runner.py
    normalization, shared."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    dt = df.schema[ts_col].dataType
    if isinstance(dt, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if not isinstance(dt, TimestampType):
        raise TypeError(
            f"interval_join: {ts_col!r} is {dt.simpleString()}, not a "
            "timestamp — cast the event-time column first"
        )
    return df


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_ts: str = "ts",
    right_ts: str = "right_ts",
    before: str = "0 seconds",
    after: str = "15 minutes",
    left_watermark: str = "30 minutes",
    right_watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Equi-key + event-time-interval join of two (streaming or
    batch) frames: a right row matches a left row when they share
    ``on`` and ``right_ts`` is within ``[left_ts - before,
    left_ts + after]`` (both ends inclusive).

    Both watermarks and the two-sided time-range condition are always
    installed — the combination Structured Streaming needs to bound
    join state and to close unmatched rows for the outer modes.
    ``left_ts`` and ``right_ts`` must be DIFFERENT names (both appear
    in the output; the interval between them is usually the feature
    being computed), and non-key column names must not collide.
    """
    keys: List[str] = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("interval_join: need at least one join key")
    if how not in _JOIN_MODES:
        raise ValueError(
            f"interval_join: how={how!r}; one of {_JOIN_MODES} "
            "(stream-stream semi/anti joins are not supported by "
            "Structured Streaming)"
        )
    if left_ts == right_ts:
        raise ValueError(
            "interval_join: left_ts and right_ts must differ "
            f"(both {left_ts!r}) — rename one side's event-time "
            "column; both timestamps appear in the output"
        )
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(
                f"interval_join: join key {k!r} missing from "
                f"{'left' if k not in left.columns else 'right'} side"
            )
    collisions = (
        (set(left.columns) & set(right.columns)) - set(keys)
    )
    if collisions:
        raise ValueError(
            "interval_join: non-key columns collide across sides: "
            f"{sorted(collisions)} — rename them (a silently "
            "ambiguous column is how the wrong feature ships)"
        )

    left = _with_event_time(left, left_ts)
    right = _with_event_time(right, right_ts)
    if left.isStreaming:
        left = left.withWatermark(left_ts, left_watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, right_watermark)

    # keys are renamed on the right so the equi-condition is
    # unambiguous, then dropped — output carries one copy of each key
    r = right
    for k in keys:
        r = r.withColumnRenamed(k, f"__r_{k}")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__r_{k}"))
    cond = (
        cond
        & (
            F.col(right_ts)
            >= F.col(left_ts) - F.expr(f"INTERVAL {before}")
        )
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {after}")
        )
    )
    out = left.join(r, cond, how)
    # for right-only rows (right/full outer) the kept key column is
    # NULL on the left side: coalesce the pair before dropping
    for k in keys:
        out = out.withColumn(
            k, F.coalesce(F.col(k), F.col(f"__r_{k}"))
        ).drop(f"__r_{k}")
    return out


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: Union[str, Sequence[str]],
    how: str = "left",
    broadcast_dim: Optional[bool] = True,
) -> DataFrame:
    """Stream-static enrichment: join a stream against a bounded
    dimension frame.  No watermark needed — the static side is not
    buffered as state; it is re-evaluated per micro-batch (so a
    parquet-backed dim picks up NEW FILES between batches — handy for
    slowly-growing dims, surprising if you expected a frozen
    snapshot; pin a snapshot by checkpointing the dim first).

    ``broadcast_dim=True`` (default) hints the broadcast so the
    stream side never exchanges — almost always right for a
    dimension; pass False for a dim too large to broadcast."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(
            "stream_static_enrich: how must be 'inner' or 'left' — "
            "outer-on-the-static-side would need the stream fully "
            "buffered, which streaming cannot do"
        )
    collisions = (set(stream.columns) & set(dim.columns)) - set(keys)
    if collisions:
        raise ValueError(
            "stream_static_enrich: non-key columns collide across "
            f"sides: {sorted(collisions)} — rename them (the same "
            "stance as interval_join: a silently ambiguous column is "
            "how the wrong feature ships)"
        )
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, keys, how)
