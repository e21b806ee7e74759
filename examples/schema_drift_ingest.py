"""Schema drift MID-INGEST: the realistic 100 TB corpus story where
the producer's schema evolves while the dedup pipeline keeps running —
generation 2 widens ``doc_id`` (int → bigint) and adds ``n_chars``,
and nothing about the running dedup state has to care:

* The persistent indexes (``md5(text)`` digests, MinHash band keys)
  are SCHEMA-STABLE projections — they never carry payload columns,
  so a widened key or an added column cannot invalidate them.
  Reposts of generation-1 text are still dropped by generation-2
  batches, and ``compact_ingest_state`` folds a drift-straddling
  index without complaint.
* The survivor snapshots land per batch with each generation's OWN
  schema.  Reading them back is where evolution is handled — ONCE, at
  read time, by ``read_evolved`` (sources/evolve.py): per-snapshot
  safe-cast alignment + unionByName onto the widened target.  A plain
  ``mergeSchema`` read would refuse the int→bigint change
  (CANNOT_MERGE_SCHEMAS — measured, Spark 4.1).

Composition pinned by tests/test_evolve.py::
test_ingest_state_survives_schema_drift.

Run: python examples/schema_drift_ingest.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from smashed_spark.sources.evolve import read_evolved, schema_drift
from smashed_spark.streaming.ingest import (
    compact_ingest_state,
    ingest_dedup_batch,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    root = tempfile.mkdtemp(prefix="smashed_drift_ingest_")
    state, out = root + "/state", root + "/out"
    try:
        # ---- generation 1: narrow schema (int keys, no n_chars) -----
        gen1 = docs.filter(F.col("doc_id") % 2 == 0).select(
            F.col("doc_id").cast("int").alias("doc_id"), "text"
        )
        ingest_dedup_batch(gen1, state, out, batch_id=0, fuzzy=False)

        # ---- generation 2: the producer widened doc_id and added ----
        # n_chars; a third of the batch reposts generation-1 text
        gen2 = (
            docs.filter(F.col("doc_id") % 2 == 1)
            .unionByName(
                docs.filter(F.col("doc_id") % 6 == 0).withColumn(
                    "doc_id", F.col("doc_id") + F.lit(3_000_000_000)
                )
            )
            .withColumn("n_chars", F.length("text"))
        )
        ingest_dedup_batch(gen2, state, out, batch_id=1, fuzzy=False)
        compact_ingest_state(spark, state, fuzzy=False)

        # ---- read the drift-straddling survivors back ---------------
        snapshots = [f"{out}/batch=0", f"{out}/batch=1"]
        print("drift report:")
        schema_drift(spark, snapshots).show(truncate=False)
        corpus = read_evolved(
            spark, snapshots, "doc_id bigint, text string, n_chars bigint"
        )
        n_gen1 = corpus.filter(F.col("n_chars").isNull()).count()
        n_gen2 = corpus.filter(F.col("n_chars").isNotNull()).count()
        n_repost = corpus.filter(
            F.col("doc_id") >= 3_000_000_000
        ).count()
        print(
            f"survivors: {n_gen1} gen-1 rows (typed-NULL n_chars) + "
            f"{n_gen2} gen-2 rows on the widened schema; "
            f"{n_repost} cross-generation reposts survived (expect 0)"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
