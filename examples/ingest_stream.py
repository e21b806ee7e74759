"""Streaming ingestion dedup: the daily-batch pattern of
``ingest_daily.py`` run as a Structured Streaming job —
``streaming_ingest_dedup`` wires the exact-digest and MinHash-band
incremental dedups into a ``foreachBatch`` loop whose only persistent
state is two compact parquet indexes (32 B + ~144 B per surviving
doc).  Survivors and index extensions commit under
``batch=<id>`` subdirectories, so a replayed micro-batch overwrites
its own output instead of duplicating it (idempotent under
foreachBatch's at-least-once contract).

Here the "stream" is the documents table split into two parquet files
drained one per micro-batch (``maxFilesPerTrigger=1``) — the same
wiring points at a file-arrival directory or Kafka in production.
The tail runs the SAME feed through ``streaming_dedup_to_snapshot``:
survivors land as versions of a governed snapshot table (atomic
commits, time travel, exactly-once via the app/batch watermark)
instead of ``batch=`` directories — the landing-zone variant.

Run: python examples/ingest_stream.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from smashed_spark.streaming.ingest import streaming_ingest_dedup


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    work = tempfile.mkdtemp(prefix="smashed_ingest_stream_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    # day 1: even ids; day 2: reposts of day 1 multiples-of-10 plus
    # the odd-id remainder — one file per "day"
    day1 = docs.filter(F.col("doc_id") % 2 == 0)
    reposts = day1.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    day2 = docs.filter(F.col("doc_id") % 2 == 1).unionByName(reposts)
    day1.coalesce(1).write.parquet(f"{work}/feed/d1")
    day2.coalesce(1).write.parquet(f"{work}/feed/d2")

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/feed/*")
    )
    q = streaming_ingest_dedup(
        stream,
        state_dir=f"{work}/state",
        out_dir=f"{work}/clean",
        checkpoint_dir=f"{work}/ckpt",
    )
    q.awaitTermination(300)

    survivors = spark.read.parquet(f"{work}/clean/batch=*")
    n = survivors.count()
    n_reposts = survivors.filter(F.col("doc_id") >= 1_000_000).count()
    n_digests = spark.read.parquet(f"{work}/state/digests").count()
    n_bands = spark.read.parquet(f"{work}/state/bands").count()
    print(
        f"drained 2 micro-batches: {n} survivors "
        f"({n_reposts} reposts slipped through), index state: "
        f"{n_digests} digests + {n_bands} band keys"
    )

    # --- the landing-zone variant: same scrub, governed table sink --
    from smashed_spark.sources.snapshot import (
        list_snapshots,
        read_snapshot,
    )
    from smashed_spark.streaming.snapshot_sink import (
        streaming_dedup_to_snapshot,
    )

    stream2 = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/feed/*")
    )
    q = streaming_dedup_to_snapshot(
        stream2,
        table_root=f"{work}/table",
        state_dir=f"{work}/state2",
        checkpoint_dir=f"{work}/ckpt2",
        app_id="ingest-demo",
        stats_columns=["doc_id"],
    )
    q.awaitTermination(300)
    table_n = read_snapshot(spark, f"{work}/table").count()
    print(
        f"landing zone: versions {list_snapshots(f'{work}/table')}, "
        f"{table_n} deduped docs in the table"
    )

    # --- downstream consumer: the durable-cursor change feed --------
    # (an index builder / feature job polls the governed table and
    # processes ONLY the rows new since its last poll — at-least-once,
    # cursor advanced only after the callback returns)
    from smashed_spark.sources.change_feed import snapshot_change_feed

    seen = []
    feed = lambda df, since, version: seen.append(  # noqa: E731
        (since, version, df.count())
    )
    out1 = snapshot_change_feed(
        spark, f"{work}/table", f"{work}/feed_cursor.json", feed
    )
    out2 = snapshot_change_feed(  # nothing new: noop, no callback
        spark, f"{work}/table", f"{work}/feed_cursor.json", feed
    )
    print(
        f"change feed: bootstrap processed {seen[0][2]} rows at "
        f"v{out1['version']}; second poll: {out2['status']}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
