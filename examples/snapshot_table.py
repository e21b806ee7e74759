"""A snapshot TABLE as the corpus landing zone: exactly-once streaming
appends, incremental consumption of just the new documents, and
crash-safe maintenance (GDPR deletes, Z-order optimize, vacuum) — the
object-store lifecycle a 100 TB ingest corpus actually runs.

The table protocol (smashed_spark/sources/snapshot.py) commits every
write as an immutable versioned manifest + one atomic pointer flip, so
readers always see whole batches, time travel is free, and a crashed
writer leaves nothing but vacuumable debris.  Appends cost O(new data)
however large the table; per-file min/max envelope stats let
``read_snapshot(where=...)`` skip files before Spark ever schedules a
task for them.

Run: python examples/snapshot_table.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from smashed_spark.sources.snapshot import (
    apply_deletions_snapshot,
    list_snapshots,
    optimize_snapshot,
    plan_snapshot_scan,
    read_snapshot,
    read_snapshot_changes,
    resolve_snapshot,
    resolve_tag,
    snapshot_history,
    tag_snapshot,
    vacuum_snapshots,
)
from smashed_spark.streaming.snapshot_sink import (
    snapshot_batch_writer,
    stream_commit_watermark,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        # days()-partitioned tables format directory granules under
        # the session zone; the pruner compares read literals in UTC
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    work = tempfile.mkdtemp(prefix="snapshot_table_example_")
    table = f"{work}/corpus"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars", "source", "text"
    )

    # --- days arrive as micro-batches: exactly-once appends ---------
    # (a live pipeline wires this body into writeStream.foreachBatch
    # via streaming_snapshot_append; calling it directly shows the
    # same idempotence contract without a streaming source)
    write_batch = snapshot_batch_writer(
        table, app_id="corpus-ingest", stats_columns=["doc_id", "n_chars"]
    )
    for day, batch_id in ((0, 0), (1, 1), (2, 2)):
        write_batch(docs.filter(F.col("doc_id") % 3 == day), batch_id)
    write_batch(docs.filter(F.col("doc_id") % 3 == 1), 1)  # replay: no-op
    print("versions:", list_snapshots(table))
    print("watermark (app, batch):", stream_commit_watermark(table))
    print("rows:", resolve_snapshot(table).row_count)

    # --- incremental consumers read ONLY the new documents ----------
    # (feed these into dedup_incremental / an ANN index build without
    # ever rescanning the base corpus)
    fresh = read_snapshot_changes(spark, table, since_version=1)
    print("docs appended since v1:", fresh.count())

    # --- pin the ingested state as a named release -------------------
    # (a tagged version — and whatever links it to the present — is
    # exempt from vacuum, so the training run stays reproducible)
    tag_snapshot(table, "release-day2")

    # --- GDPR forget-list + layout optimize, each ONE atomic commit --
    forget = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id")
    apply_deletions_snapshot(spark, table, keys=forget, key_field="doc_id")
    optimize_snapshot(
        spark,
        table,
        cluster_by=["n_chars", "doc_id"],
        bits=10,
        num_files=8,
        stats_columns=["doc_id", "n_chars"],
    )
    # every superseded version stays time-travelable until vacuumed
    vacuum_snapshots(table, keep_last=2, drop_unpublished=True)
    print("after maintenance:", list_snapshots(table))
    pinned = resolve_tag(table, "release-day2")
    print(
        f"pinned release still reads: v{pinned.version}, "
        f"{pinned.row_count} rows"
    )
    for h in snapshot_history(table):
        tags = f" tags={h['tags']}" if h["tags"] else ""
        print(
            f"  v{h['version']:<3} {h['operation']:<9} "
            f"rows={h['row_count']:<6} files={h['n_files']}{tags}"
        )

    # --- envelope-stats file skipping on the optimized layout --------
    where = [("n_chars", ">=", 400)]
    plan = plan_snapshot_scan(resolve_snapshot(table), where)
    long_docs = read_snapshot(spark, table, where=where)
    print(
        f"pruned scan: {plan['files_kept']}/{plan['files_total']} files, "
        f"{long_docs.count()} rows"
    )
    long_docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.avg("n_chars").alias("avg_chars"),
    ).orderBy("lang").show()

    # --- r14: a partitioned table + schema evolution + scoped delete
    # A daily-ingest table laid out in days() directories: the derived
    # day column lives only in paths (the schema never changes), and
    # time-range reads prune whole directories from the manifest alone
    # — no envelope stats needed.
    import datetime as dt

    from smashed_spark.sources.snapshot import (
        append_snapshot,
        publish_snapshot,
    )

    table2 = f"{work}/daily"
    dated = docs.withColumn(
        "ingested_at",
        F.to_timestamp(F.lit("2026-08-01 00:00:00"))
        + F.make_interval(days=(F.col("doc_id") % 7).cast("int")),
    )
    publish_snapshot(
        dated,
        table2,
        partition_transforms={"day": ("days", "ingested_at")},
        stats_columns=["doc_id"],
    )
    cut = dt.datetime(2026, 8, 6, tzinfo=dt.timezone.utc)
    where2 = [("ingested_at", ">=", cut)]
    plan2 = plan_snapshot_scan(resolve_snapshot(table2), where2)
    print(
        f"directory pruning: {plan2['files_kept']}/"
        f"{plan2['files_total']} files for ingested_at >= {cut.date()}"
    )
    recent = read_snapshot(spark, table2, where=where2)
    print("recent rows:", recent.count())

    # schema evolution: a later batch ships a quality score — the
    # manifest mints a new schema generation, old rows read back with
    # a typed NULL, and the daily layout is inherited automatically
    day8 = (
        docs.limit(50)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .withColumn(
            "ingested_at", F.to_timestamp(F.lit("2026-08-08 00:00:00"))
        )
        .withColumn("quality", (F.col("n_chars") / 100.0))
    )
    evolved = append_snapshot(table_root=table2, df=day8, evolve=True)
    print(
        "evolved schema generations:",
        sorted(evolved.schemas),
        "columns:",
        list(evolved.columns),
    )
    with_quality = read_snapshot(spark, table2)
    print(
        "rows with quality score:",
        with_quality.filter(F.col("quality").isNotNull()).count(),
        "of",
        with_quality.count(),
    )

    # file-scoped forget-list: only files whose doc_id envelopes can
    # hold a forget key are rewritten — every other entry is carried
    # verbatim (O(affected files), not O(table)); scope_where bounds
    # the delete to one day so the same key elsewhere survives
    before2 = resolve_snapshot(table2)
    # doc_id 5 lands on 2026-08-06 (in scope: deleted); doc_id 3 on
    # 2026-08-04 (out of scope: survives even though its key matches)
    after2 = apply_deletions_snapshot(
        spark,
        table2,
        keys=[5, 3],
        key_field="doc_id",
        scope_where=[("ingested_at", ">=", cut)],
        stats_columns=["doc_id"],
    )
    untouched = sum(1 for f in after2.files if f in before2.files)
    print(
        f"scoped delete: {untouched}/{len(before2.files)} file entries "
        f"carried verbatim; rows {before2.row_count} -> {after2.row_count}"
        f"; doc 3 (out of scope) survives: "
        f"{read_snapshot(spark, table2).filter('doc_id = 3').count() == 1}"
    )

    # incremental Z-order maintenance on the first corpus table: the
    # day's append is re-keyed under the PERSISTED bounds and every
    # already-clustered file entry rides the manifest verbatim —
    # O(new data) daily maintenance, like Delta/Iceberg OPTIMIZE
    append_snapshot(
        docs.limit(40).withColumn("doc_id", F.col("doc_id") + 2_000_000),
        table,
        stats_columns=["doc_id", "n_chars"],
    )
    pre_inc = resolve_snapshot(table)
    inc = optimize_snapshot(
        spark,
        table,
        cluster_by=["n_chars", "doc_id"],
        bits=10,
        num_files=1,
        incremental=True,
        stats_columns=["doc_id", "n_chars"],
    )
    carried = sum(1 for f in inc.files if f in pre_inc.files)
    print(
        f"incremental optimize: {carried}/{len(pre_inc.files)} entries "
        f"carried, {len(inc.files) - carried} file(s) re-keyed"
    )

    # --- r15: MERGE (upsert) — the daily re-crawl verb ---------------
    # Matched doc_ids are REPLACED by the batch copy, unmatched ids
    # INSERT, untouched rows — and untouched FILES, on this clustered
    # table — survive verbatim, all as one atomic commit
    from smashed_spark.sources.snapshot import merge_snapshot

    recrawl = docs.filter(F.col("doc_id") % 97 == 1).withColumn(
        "text", F.concat(F.lit("[recrawled] "), F.col("text"))
    )
    inserts = (
        docs.limit(25)
        .withColumn("doc_id", F.col("doc_id") + 3_000_000)
    )
    pre_merge = resolve_snapshot(table)
    merged = merge_snapshot(
        spark, table, recrawl.unionByName(inserts), "doc_id"
    )
    carried_m = sum(1 for f in merged.files if f in pre_merge.files)
    print(
        f"merge upsert: rows {pre_merge.row_count} -> "
        f"{merged.row_count}; {carried_m}/{len(pre_merge.files)} file "
        "entries carried verbatim"
    )
    print(
        "recrawled text visible:",
        read_snapshot(spark, table)
        .filter(F.col("text").startswith("[recrawled]"))
        .count(),
    )

    # --- r15: as_of time travel — read the table as it WAS -----------
    # (pre-merge state by instant, not version number; an instant that
    # predates version 1 or a vacuumed chain refuses loudly)
    back_then = read_snapshot(
        spark, table, as_of=pre_merge.committed_at
    )
    print(
        f"as_of {pre_merge.committed_at:.0f}: "
        f"{back_then.filter(F.col('text').startswith('[recrawled]')).count()} "
        f"recrawled rows (pre-merge state), {back_then.count()} total"
    )

    # --- r15: ROLLBACK — undo the merge as one metadata-only commit --
    # (zero data moved; history preserved: the merged version stays
    # readable behind the new head until vacuumed.  Restoring past a
    # GDPR delete resurrects the forgotten rows — re-apply the list.)
    from smashed_spark.sources.snapshot import restore_snapshot

    rolled = restore_snapshot(table, version=pre_merge.version)
    print(
        f"restore: v{rolled.version} (restored_from v"
        f"{pre_merge.version}), rows back to {rolled.row_count}; "
        f"recrawled rows now: "
        f"{read_snapshot(spark, table).filter(F.col('text').startswith('[recrawled]')).count()}"
    )

    # --- r15: the delete/merge scoping health check -------------------
    from smashed_spark.sources.snapshot import snapshot_table_stats

    overlap = snapshot_table_stats(table)["envelope_overlap_avg"]
    print(
        "envelope_overlap_avg (should be ~1 on this clustered table; "
        f">>1 means keyed deletes/merges degrade to O(table)): {overlap}"
    )

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
