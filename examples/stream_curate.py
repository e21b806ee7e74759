"""Streaming corpus curation: an unbounded document feed flows through
the SAME row-local curation pipeline the batch path uses — language ID,
quality scoring, token counting, a quality filter — and lands in a
parquet sink, micro-batch by micro-batch.

Every mapper here is narrow (a Column expression or Arrow batch fn), so
``apply_pipeline_stream`` accepts it unchanged; ``assert_streamable``
would reject order-sensitive stages (striding, enumeration, dedup
joins) up front.  This is the ingest-time half of a curation stack:
score-and-filter on arrival, leave the multi-pass stages (dedup, ANN)
to scheduled batch jobs over the curated store.

Run: python examples/stream_curate.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from smashed_spark.core.pipeline import Pipeline
from smashed_spark.functions.cleaning import GopherQualityFilterMapper
from smashed_spark.functions.textstats import (
    LangIdMapper,
    QualityScoreMapper,
    TokenCountMapper,
)
from smashed_spark.operators.filters import FilterMapper
from smashed_spark.streaming.runner import apply_pipeline_stream


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    pipeline = Pipeline(
        [
            LangIdMapper(),
            QualityScoreMapper(),
            TokenCountMapper(),
            # the canned Gopher verdict is row-local, so it streams
            # unchanged (assert_streamable accepts it)
            GopherQualityFilterMapper(min_words=30, drop=True),
            FilterMapper("q_score", ">=", 0.5),
        ]
    )

    # stage the corpus as a feed DIRECTORY of parquet files — the
    # FileStreamSource shape: new files appearing under the dir become
    # micro-batches (a single .parquet file is not a valid stream base)
    out_dir = tempfile.mkdtemp(prefix="stream_curate_")
    feed = out_dir + "/feed"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(4).write.parquet(feed)

    curated = apply_pipeline_stream(spark, feed, docs.schema, pipeline)
    q = (
        curated.writeStream.format("parquet")
        .option("path", out_dir + "/data")
        .option("checkpointLocation", out_dir + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    back = spark.read.parquet(out_dir + "/data")
    print(f"curated {back.count()}/{docs.count()} docs -> {out_dir}/data")
    back.groupBy("lang_pred").count().orderBy("lang_pred").show()
    spark.stop()


if __name__ == "__main__":
    main()
