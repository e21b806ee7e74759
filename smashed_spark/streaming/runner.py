"""Structured Streaming support.

The reference has NO streaming semantics (SURVEY.md §2.9) — its only
lazy surface is generator-based batched mappers and HF
``IterableDataset`` pass-through.  This module is the additive Spark
analog: every *row-local* mapper (no shuffle, no order dependence)
works unchanged on a streaming DataFrame because it is just a Column
expression or mapInPandas over micro-batches.

Provided here:
* ``streamable(mapper)`` / ``assert_streamable(pipeline)`` — classify
  which mappers are safe on unbounded input;
* ``apply_pipeline_stream`` — fold a pipeline over ``readStream``;
* ``windowed_event_counts`` — the canonical watermark + event-time
  window aggregation over the ``events`` table shape.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.mapper import SparkMapper
from ..core.pipeline import Pipeline

# mapper classes whose semantics need bounded input (order-sensitive
# grouping, global ranks, self-joins, per-key aggregation joined back,
# or an unbounded-stream-side anti join).  RangeJoinMapper is absent
# deliberately: its inner path is a stream-static equi-join, which
# Structured Streaming supports.
_UNSTREAMABLE = {
    "EnumerateFieldMapper",
    "FixedBatchSizeMapper",
    "FewShotJinjaMapper",
    "MinHashLSHPairsMapper",
    "NGramJaccardPairsMapper",
    "EmbeddingNearDupPairsMapper",
    "CosineTopK",
    "HyperplaneLSHTopK",
    "IVFCosineTopK",
    "ExactDedupMapper",
    "SimHashNearDupPairsMapper",
    "RepetitionStatsMapper",
    "AsofJoinMapper",
    "DecontaminateMapper",
    "SessionizeMapper",
    "SessionStatsMapper",
    # r6 multi-pass additions: corpus-global occurrence counts /
    # clustering / packing state — none can run on unbounded input
    "DuplicatedWindowsMapper",
    "DuplicatedSpansMapper",
    "RemoveDuplicatedSpansMapper",
    "DedupParagraphsMapper",
    "DedupClustersMapper",
    "SemanticNearDupPairsMapper",
    "PackSequencesMapper",
    "BinPackSequencesMapper",
}


def streamable(mapper: SparkMapper) -> bool:
    return type(mapper).__name__ not in _UNSTREAMABLE


def assert_streamable(pipeline: Pipeline) -> None:
    bad = [m.name for m in pipeline.mappers if not streamable(m)]
    if bad:
        raise ValueError(
            f"mappers not applicable to unbounded streams: {bad} "
            "(order-sensitive or multi-pass semantics)"
        )


def apply_pipeline_stream(
    spark: SparkSession,
    path: str,
    schema,
    pipeline: Pipeline,
    fmt: str = "parquet",
) -> DataFrame:
    """``readStream`` -> pipeline -> streaming DataFrame (start a sink
    with ``.writeStream`` on the result)."""
    assert_streamable(pipeline)
    stream = (
        spark.readStream.format(fmt).schema(schema).load(path)
    )
    return pipeline.map(stream)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Watermarked event-time windowed counts — the standard late-data-
    tolerant streaming aggregation; also valid on a batch DataFrame
    (used for the oracle check).

    Late-data note (pinned by
    tests/test_multimodal_streaming.py::test_windowed_counts_drop_too_late_events):
    a batch's max event time moves the watermark, but the new value
    only FILTERS input one batch later — a straggler arriving in the
    very next micro-batch after the advance may still be aggregated.
    Size ``watermark`` for the real out-of-orderness plus one trigger
    interval."""
    from pyspark.sql.types import TimestampNTZType

    # watermarks require TIMESTAMP; parquet written with the session
    # default TIMESTAMP_NTZ (or inferred as NTZ on read) is rejected by
    # withWatermark, so normalize the event-time column first
    if isinstance(events.schema["ts"].dataType, TimestampNTZType):
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(
    events: DataFrame,
    id_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication on a key subset —
    ``dropDuplicatesWithinWatermark``: state holds one entry per key
    seen within the watermark horizon, so memory is O(keys/horizon),
    not O(stream).  The at-least-once ingestion edge (replayed
    Kafka/file batches, retried producers) is exactly where a training
    -data feed duplicates documents, and a bounded-horizon dedup is
    the standard fix.

    Semantics: a duplicate arriving within the watermark delay of the
    first occurrence is dropped; after state expiry the key counts as
    new again.  For a bounded replay whose duplicates all sit inside
    one horizon (the gate setup), the result equals batch
    ``dropDuplicates(id_cols)`` — hence SQL-oracle-able.

    On a batch DataFrame this falls back to plain
    ``dropDuplicates(id_cols)`` — the exact bounded-data semantics
    (Spark refuses to execute DeduplicateWithinWatermark in batch
    mode), and what the gate oracle computes.
    """
    from pyspark.sql.types import TimestampNTZType

    if not events.isStreaming:
        return events.dropDuplicates(list(id_cols))
    if isinstance(events.schema[ts_col].dataType, TimestampNTZType):
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )


def drain_bounded(
    out: DataFrame,
    query_name: str,
    timeout_seconds: float = 300.0,
    output_mode: str = "append",
) -> None:
    """Drain a bounded streaming DataFrame so that
    ``spark.table(query_name)`` holds the result — ``availableNow``
    trigger, clean self-termination, checkpoint removed afterwards.

    The sink is selected by ``SMASHED_STREAM_SINK``:

    * ``memory`` (default) — the gate path: rows land in the driver's
      memory-sink table, which is what the driver's value comparison
      reads.
    * ``parquet`` — the PRODUCTION path: rows go executor -> files,
      never through a driver collect; after termination the written
      files are registered as a temp view under ``query_name`` so the
      caller's ``spark.table`` works identically.  The scale probe
      sets this so 10x/100x headlines time the operator plus a real
      distributed sink, not the memory sink's driver-side collect
      (round 5's 100x stream_sessionize forensics measured the
      memory sink adding a superlinear 14.8x-per-decade term where
      the parquet sink shows 6.7x — see BENCH_SCALE.json
      ``sink_ab_100x``).
    """
    import atexit
    import os
    import shutil
    import tempfile

    spark = out.sparkSession
    sink = os.environ.get("SMASHED_STREAM_SINK", "memory")
    if sink not in ("memory", "parquet"):
        raise ValueError(f"SMASHED_STREAM_SINK must be memory|parquet, got {sink!r}")
    if sink == "parquet" and output_mode != "append":
        raise ValueError(
            "the parquet streaming sink supports append mode only; "
            f"got output_mode={output_mode!r}"
        )
    checkpoint_dir = tempfile.mkdtemp(prefix="smashed_stream_ckpt_")
    writer = (
        out.writeStream.queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    data_dir = None
    if sink == "parquet":
        data_dir = tempfile.mkdtemp(prefix=f"smashed_sink_{query_name}_")
        q = writer.format("parquet").option("path", data_dir).start()
    else:
        q = writer.format("memory").start()
    try:
        q.awaitTermination(timeout_seconds)
    finally:
        if q.isActive:  # timed out: don't yank the checkpoint mid-commit
            q.stop()
            q.awaitTermination(30)
        if q.isActive:
            # stop() was issued but the query hasn't wound down in 30 s;
            # removing the checkpoint under a live query risks a commit
            # error, so defer the cleanup to interpreter exit instead of
            # leaking the temp dir across repeated gate runs
            atexit.register(
                shutil.rmtree, checkpoint_dir, ignore_errors=True
            )
        else:
            shutil.rmtree(checkpoint_dir, ignore_errors=True)
        if data_dir is not None:
            # explicit schema: a zero-row drain leaves no parquet files
            # to infer from.  The view (and its backing files) must
            # outlive this call — the caller returns a lazy frame over
            # it — so the data dir is cleaned at interpreter exit.
            spark.read.schema(out.schema).parquet(
                data_dir
            ).createOrReplaceTempView(query_name)
            atexit.register(shutil.rmtree, data_dir, ignore_errors=True)


def run_stream_bounded(
    out: DataFrame,
    query_name: str,
    timeout_seconds: float = 300.0,
    output_mode: str = "append",
) -> None:
    """Drain a bounded streaming DataFrame into the configured sink
    (see :func:`drain_bounded`) — the generic version of
    ``stateful.run_sessionize_bounded``'s sink handling, for operators
    that don't need the no-data-micro-batch tweak (dedup state expiry
    is driven by the watermark advancing with data; the trailing
    no-data batch is how the LAST watermark value evicts state, so it
    stays enabled here)."""
    drain_bounded(
        out,
        query_name,
        timeout_seconds=timeout_seconds,
        output_mode=output_mode,
    )

def start_foreach_batch(
    stream,
    body,
    checkpoint_dir: str,
    query_name: str,
    available_now: bool,
    entry_name: str,
    batch_hint: str,
):
    """The shared foreachBatch launch sequence every streaming entry
    point in this package uses (queryName -> foreachBatch ->
    checkpointLocation -> optional availableNow trigger -> start), so
    trigger/checkpoint handling changes in exactly one place.  Raises
    for a batch DataFrame with the entry point's own name and its
    batch-mode alternative."""
    if not stream.isStreaming:
        raise ValueError(
            f"{entry_name} needs a streaming DataFrame; {batch_hint}"
        )
    writer = (
        stream.writeStream.queryName(query_name)
        .foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
