"""Storage-layout lifecycle for a 100 TB corpus — write it right,
measure what that bought, keep it healthy, and honor deletions:

1. OPTIMIZE: write the documents corpus Z-order-clustered on
   (n_chars, doc_id) with a day partition transform on top — the two
   pruning tiers (directory, then file/row-group) a scan needs;
2. AUDIT: read the parquet footers (distributed) and measure the
   fraction of rows a range predicate is entitled to skip under the
   new layout vs a naive write — the number that justifies the
   clustered write;
3. COMPACT: simulate an incremental-ingest small-files pile and
   rewrite it to target-sized files with the zero-exchange scan-side
   bin-packing;
4. GOVERN: apply a forget list (broadcast anti-join rewrite with
   footer-based accounting) and expire old partitions as directory
   deletes;
5. TRACE: read back with provenance (file, row_index) lineage.

Run: python examples/layout_lifecycle.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from smashed_spark.plans.registry import load
from smashed_spark.sources.layout import (
    compact_dataset,
    days,
    optimize_layout,
    read_with_provenance,
    scan_stats,
    skip_fraction,
)
from smashed_spark.sources.retention import (
    apply_deletions,
    drop_partitions_older_than,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("layout-lifecycle")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="layout_lifecycle_")

    docs = load(spark, sf_dir, "documents")
    # a synthetic ingest day so the partition tiers have something to
    # prune (sf documents carry no timestamp)
    docs = docs.withColumn(
        "ingested_at",
        F.to_timestamp(
            F.concat(
                F.lit("2024-01-0"),
                (F.col("doc_id") % 5 + 1).cast("string"),
                F.lit(" 12:00:00"),
            )
        ),
    )

    # 1. OPTIMIZE ---------------------------------------------------------
    clustered = os.path.join(base, "clustered")
    report = optimize_layout(
        docs,
        clustered,
        cluster_by=["n_chars", "doc_id"],
        bits=12,
        num_files=8,
        partition_transforms={"day": days("ingested_at")},
    )
    print(f"clustered write: {report['num_files']} files/partition-range, "
          f"bounds {report['bounds']}")

    # 2. AUDIT ------------------------------------------------------------
    # measure the file-level tier on an unpartitioned clustered copy
    # (at demo scale the 5-way day split leaves ~1 Z-range per day,
    # which would understate what clustering buys)
    flat = os.path.join(base, "flat_clustered")
    optimize_layout(
        docs.drop("ingested_at"), flat,
        cluster_by=["n_chars", "doc_id"], bits=12, num_files=16,
    )
    naive = os.path.join(base, "naive")
    docs.repartition(16).write.parquet(naive)
    lo, hi = report["bounds"]["n_chars"]
    width = (hi - lo) // 10
    pred = (lo + (hi - lo) // 2, lo + (hi - lo) // 2 + width)
    f_clustered = skip_fraction(
        scan_stats(spark, flat, ["n_chars"]),
        "n_chars", lower=pred[0], upper=pred[1],
    )
    f_naive = skip_fraction(
        scan_stats(spark, naive, ["n_chars"]),
        "n_chars", lower=pred[0], upper=pred[1],
    )
    print(
        f"10%-wide n_chars predicate skips "
        f"{f_clustered['row_skip_fraction']:.0%} of rows clustered vs "
        f"{f_naive['row_skip_fraction']:.0%} naive"
    )

    # directory pruning on top: one day of five
    one_day = spark.read.parquet(clustered).filter("day = '2024-01-03'")
    print(f"day-partition scan: {one_day.count()} rows (directory-pruned)")

    # 3. COMPACT ----------------------------------------------------------
    pile = os.path.join(base, "pile")
    docs.select("doc_id", "text").repartition(64).write.parquet(pile)
    c = compact_dataset(spark, pile, target_file_bytes=8 << 20)
    print(f"compaction: {c['files_before']} -> {c['files_after']} files")

    # 4. GOVERN -----------------------------------------------------------
    forget = [int(r["doc_id"]) for r in
              docs.select("doc_id").limit(25).collect()]
    d = apply_deletions(
        spark, pile, forget, "doc_id", verify_all_deleted=True
    )
    print(
        f"forget list: {d['rows_deleted']} rows deleted "
        f"({d['strategy']} tier), {d['remaining_matches']} remaining"
    )
    sweep = drop_partitions_older_than(clustered, "day", "2024-01-03")
    print(
        f"retention sweep: dropped days {sweep['partitions_dropped']}, "
        f"kept {sweep['partitions_kept']}"
    )

    # 4b. EVOLVE -----------------------------------------------------------
    # next year's snapshot adds a column and widens a type; read both
    # generations through one aligned schema and see the drift first
    from smashed_spark.sources.evolve import (
        drift_summary,
        read_evolved,
        schema_drift,
    )

    v2 = os.path.join(base, "snapshot_v2")
    docs.select(
        "doc_id", "lang",
        (F.col("n_chars") / 100.0).alias("quality"),
    ).write.parquet(v2)
    drift = drift_summary(schema_drift(spark, [pile, v2]))
    n_drifted = drift.filter("NOT in_all_files").count()
    both = read_evolved(
        spark, [pile, v2],
        "doc_id bigint, lang string, quality double",
    )
    print(
        f"schema drift: {n_drifted} (column, type) shapes not in all "
        f"files; evolved read: {both.count()} rows, "
        f"{both.filter('quality IS NULL').count()} legacy rows with "
        "NULL quality"
    )

    # 5. TRACE -------------------------------------------------------------
    pv = read_with_provenance(spark, pile)
    sample = pv.select("doc_id", "prov_file", "prov_row_index").first()
    print(
        f"provenance: doc {sample['doc_id']} is row "
        f"{sample['prov_row_index']} of {sample['prov_file']}"
    )

    # 6. PUBLISH ------------------------------------------------------------
    # where 100 TB actually lives (object stores, no atomic rename),
    # in-place swaps are off the table — maintenance becomes snapshot
    # publishes: write a new prefix, commit a versioned manifest, flip
    # the pointer atomically, vacuum the history later.  Same calls
    # against an s3:// root on a real cluster.
    from smashed_spark.sources.snapshot import (
        apply_deletions_snapshot,
        compact_snapshot,
        publish_snapshot,
        read_snapshot,
        resolve_snapshot,
        vacuum_snapshots,
    )

    table = os.path.join(base, "published_table")
    v1 = publish_snapshot(docs.drop("ingested_at").repartition(16), table)
    v2 = compact_snapshot(spark, table, target_file_bytes=16 << 20)
    v3 = apply_deletions_snapshot(spark, table, forget, "doc_id")
    cur = resolve_snapshot(table)
    print(
        f"snapshot publish: v1 {len(v1.files)} files -> compacted v2 "
        f"{len(v2.files)} -> deletions v3 ({v3.row_count} rows); "
        f"current = v{cur.version} ({cur.operation})"
    )
    # time travel: the pre-deletion snapshot stays readable until vacuum
    n_before = read_snapshot(spark, table, version=2).count()
    report = vacuum_snapshots(table, keep_last=1)
    print(
        f"time travel read v2: {n_before} rows; vacuum dropped "
        f"versions {report['dropped_versions']}, kept {report['kept']}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
