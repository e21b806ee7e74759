"""Release audit for a corpus refresh — the three r11 ops together:

1. hypertable ROLLUP of the event stream (hourly partials ingested
   incrementally, compacted, cascaded to daily, avg + distinct-user
   estimates derived from the mergeable state);
2. corpus snapshot DIFF between the shipped v1 and the candidate v2
   (added / removed / changed with per-field attribution);
3. a COUNT-MIN sketch of source frequencies maintained across the
   two versions by merge — the mergeable probe for "which sources
   grew" that survives arbitrarily many incremental refreshes.

Run: python examples/release_audit.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from smashed_spark.functions.cms import fit_cms
from smashed_spark.functions.diff import corpus_diff, diff_summary
from smashed_spark.plans.registry import load
from smashed_spark.functions.rollup import (
    RollupSpec,
    compact_rollup_state,
    read_rollup,
    rollup_estimates,
    rollup_ingest_batch,
    rollup_to_granularity,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("release-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    # --- 1. event rollup, ingested incrementally ------------------
    events = load(spark, sf_dir, "events")  # normalizes ts to TIMESTAMP
    spec = RollupSpec(
        ts_field="ts",
        keys=("event_type",),
        values=("value",),
        distinct=("user_id",),
        k=32,
    )
    state = tempfile.mkdtemp(prefix="audit_rollup_")
    for i in range(3):  # three "days" of micro-batches
        rollup_ingest_batch(
            spark, state, events.where(F.col("event_id") % 3 == i),
            i, spec, "hour",
        )
        if i == 1:
            compact_rollup_state(spark, state, spec)
    daily = rollup_to_granularity(
        read_rollup(spark, state, spec), "day", spec, finer="hour"
    )
    print("== daily rollup (from incremental hourly state) ==")
    rollup_estimates(daily, spec).orderBy("bucket", "event_type").show(
        8, truncate=False
    )

    # --- 2. snapshot diff v1 -> v2 --------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    v2 = (
        docs.where(F.col("doc_id") % 9 != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(F.col("text"), F.lit(" [rev2]")),
            ).otherwise(F.col("text")),
        )
        .unionByName(
            docs.limit(25).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                "text",
                "lang",
                F.lit("crawl_2026_08").alias("source"),
                "n_chars",
            )
        )
    )
    diff = corpus_diff(docs, v2)
    print("== v1 -> v2 diff summary ==")
    diff_summary(diff).orderBy("diff_status").show()
    print("== field attribution of changes ==")
    (
        diff.where(F.col("diff_status") == "changed")
        .groupBy(F.array_join("changed_fields", ",").alias("fields"))
        .count()
        .show()
    )

    # --- 3. mergeable source-frequency sketch ---------------------
    sk_v1 = fit_cms(docs, "source", depth=4, width=4096)
    sk_delta = fit_cms(
        v2.join(docs.select("doc_id"), "doc_id", "left_anti"),
        "source",
        depth=4,
        width=4096,
    )
    running = sk_v1.merge(sk_delta)  # state carried across refreshes
    print("== source frequency (CMS estimates, v1 + v2 delta) ==")
    for src in [
        r["source"]
        for r in v2.select("source").distinct().limit(8).collect()
    ]:
        print(f"  {src}: ~{running.estimate(src)} docs")
    spark.stop()


if __name__ == "__main__":
    main()
