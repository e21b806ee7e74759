"""The registered ``smashed_snapshot`` format end to end: one format
name (streaming/datasource.py, PySpark 4 Python DataSource API)
covers all four verbs against a governed snapshot table —

* ``df.write.format(...)``          batch overwrite/append
* ``spark.read.format(...)``        batch read + version time travel
* ``df.writeStream.format(...)``    exactly-once streaming append
* ``spark.readStream.format(...)``  incremental streaming read with
                                    Spark's own offset log

The demo builds a small documents table, streams an update feed into
it through the registered sink (watermarked: a replayed micro-batch
commits nothing), then tails the table with the registered source
into a derived parquet copy and shows checkpointed resume delivering
exactly the appended increment.  The JVM tiers (``read_snapshot`` /
``snapshot_batch_writer`` / ``read_snapshot_stream``) remain the
throughput shapes for heavy pipelines; the registered format is the
idiomatic surface — any Spark sink, joins, watermarks — with rows
moving as Arrow batches through Python workers.

Run: python examples/registered_format.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from smashed_spark.sources.snapshot import resolve_snapshot, snapshot_history
from smashed_spark.streaming.datasource import register_snapshot_source


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    register_snapshot_source(spark)
    work = tempfile.mkdtemp(prefix="smashed_registered_fmt_")
    table = os.path.join(work, "docs_table")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )

    # 1. batch write: overwrite creates the table (envelope stats on
    #    doc_id so later filtered reads can skip files)
    docs.filter(F.col("doc_id") % 2 == 0).repartitionByRange(
        4, "doc_id"
    ).write.format("smashed_snapshot").mode("overwrite").option(
        "statsColumns", "doc_id"
    ).save(table)
    v1 = resolve_snapshot(table)
    print(f"published v{v1.version}: {v1.row_count} rows, "
          f"{len(v1.files)} files")

    # 2. streaming sink: drain the odd-id remainder in as micro-batch
    #    appends — one snapshot version per batch, exactly-once under
    #    the app/batch watermark
    feed_dir = os.path.join(work, "feed")
    docs.filter(F.col("doc_id") % 2 == 1).repartition(2).write.parquet(
        feed_dir
    )
    sink_ckpt = os.path.join(work, "sink_ckpt")
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir)
        .writeStream.format("smashed_snapshot")
        .option("path", table)
        .option("appId", "registered_format_demo")
        .option("checkpointLocation", sink_ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    head = resolve_snapshot(table)
    print(f"streamed to v{head.version}: {head.row_count} rows; "
          f"history={[(h['version'], h['operation']) for h in snapshot_history(table)]}")

    # 3. batch read through the format: current state + time travel
    current = spark.read.format("smashed_snapshot").load(table)
    asof_v1 = (
        spark.read.format("smashed_snapshot")
        .option("version", str(v1.version))
        .load(table)
    )
    print(f"read: current={current.count()} rows, "
          f"v{v1.version} time travel={asof_v1.count()} rows")

    # 4. streaming source: tail the table into a derived parquet copy;
    #    the first availableNow run bootstraps the full state, the
    #    second delivers exactly the new append
    out_dir = os.path.join(work, "derived")
    src_ckpt = os.path.join(work, "src_ckpt")

    def tail_once() -> None:
        tq = (
            spark.readStream.format("smashed_snapshot")
            .load(table)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", src_ckpt)
            .trigger(availableNow=True)
            .start()
        )
        tq.awaitTermination(120)

    tail_once()
    n_boot = spark.read.parquet(out_dir).count()
    docs.filter(F.col("doc_id") % 2 == 0).limit(50).withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    ).write.format("smashed_snapshot").mode("append").save(table)
    tail_once()
    n_resumed = spark.read.parquet(out_dir).count()
    print(f"tail: bootstrap={n_boot} rows, after append resume="
          f"{n_resumed} rows (+{n_resumed - n_boot})")
    assert n_resumed - n_boot == 50

    print(f"done; artifacts under {work}")


if __name__ == "__main__":
    main()
