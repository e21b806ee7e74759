"""Per-job census of the streaming_ingest_fuzzy gate (r12 VERDICT ask
#6; r14: mirrors the trimmed 2-batch gate): which jobs cost
what at the bench shape (sf0.1, local[32])?

Method: monkeypatch the four job-producing DataFrame entry points
(count / collect / localCheckpoint / write.parquet) with wall timers
that attribute each call to the smashed_spark source line that issued
it, then run the EXACT gate callable from the registry.  Nothing in
the product code changes; the census sees the same plan the bench
times.

Usage: python tools/ingest_census.py [sf_dir]
Prints a per-call table + per-batch and per-stage rollups to stdout.
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

RECORDS = []  # (seq, phase, op, file:line of smashed_spark caller, sec)
_MARK = {"label": "setup"}


def _attr():
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "/smashed_spark/" in fn and "/plans/" not in fn:
            short = fn.split("/smashed_spark/")[-1]
            return f"{short}:{fr.lineno}"
    for fr in reversed(traceback.extract_stack()):
        if "/smashed_spark/" in fr.filename:
            short = fr.filename.split("/smashed_spark/")[-1]
            return f"{short}:{fr.lineno}"
    return "(driver)"


def _timed(name, orig):
    def wrap(self, *a, **k):
        t0 = time.time()
        out = orig(self, *a, **k)
        RECORDS.append(
            (len(RECORDS), _MARK["label"], name, _attr(), time.time() - t0)
        )
        return out

    return wrap


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql.classic.dataframe import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    # patch the CLASSIC subclass: pyspark 4's pyspark.sql.DataFrame is
    # a dispatch base; local sessions instantiate the classic child,
    # whose own methods would shadow a base-class patch
    DataFrame.count = _timed("count", DataFrame.count)
    DataFrame.collect = _timed("collect", DataFrame.collect)
    DataFrame.localCheckpoint = _timed(
        "localCheckpoint", DataFrame.localCheckpoint
    )
    DataFrameWriter.parquet = _timed("write.parquet", DataFrameWriter.parquet)

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet reader so batch 0 isn't charged warmup
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    RECORDS.clear()

    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from smashed_spark.plans.registry import load
    from smashed_spark.streaming.ingest import (
        compact_ingest_state,
        ingest_dedup_batch,
    )

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    shift = lambda df, k: df.withColumn(  # noqa: E731
        "doc_id", F.col("doc_id") + F.lit(k)
    )
    repost = lambda df: df.withColumn(  # noqa: E731
        "text", F.concat(F.col("text"), F.lit(" repost"))
    )
    # r14 gate shape: TWO batches, compaction (include_latest) after
    # batch 0 so batch 1 reads history entirely through batch=-1
    batches = [
        docs.filter(F.col("doc_id") % 3 == 0),
        shift(docs.filter(F.col("doc_id") % 3 == 1), 1_000_000)
        .unionByName(
            repost(shift(docs.filter(F.col("doc_id") % 6 == 0), 2_000_000))
        )
        .unionByName(
            repost(shift(docs.filter(F.col("doc_id") % 6 == 1), 4_000_000))
        ),
    ]
    # WARM LAP: run the whole lifecycle once untimed (bench reps=5
    # takes the min, so the number of record is the warm shape)
    warm_root = tempfile.mkdtemp(prefix="smashed_ingest_census_warm_")
    try:
        for i, b in enumerate(batches):
            ingest_dedup_batch(
                b, warm_root + "/state", warm_root + "/out",
                batch_id=i, fuzzy=True,
            )
            if i == 0:
                compact_ingest_state(
                    spark, warm_root + "/state", fuzzy=True,
                    include_latest=True,
                )
    finally:
        shutil.rmtree(warm_root, ignore_errors=True)
    RECORDS.clear()

    root = tempfile.mkdtemp(prefix="smashed_ingest_census_")
    state, out_dir = root + "/state", root + "/out"
    t_total = time.time()
    try:
        for i, b in enumerate(batches):
            _MARK["label"] = f"batch{i}"
            t0 = time.time()
            ingest_dedup_batch(b, state, out_dir, batch_id=i, fuzzy=True)
            print(f"## batch {i}: {time.time() - t0:.3f}s", file=sys.stderr)
            if i == 0:
                _MARK["label"] = "compact"
                t0 = time.time()
                compact_ingest_state(
                    spark, state, fuzzy=True, include_latest=True
                )
                print(
                    f"## compaction: {time.time() - t0:.3f}s",
                    file=sys.stderr,
                )
        _MARK["label"] = "final_read"
        t0 = time.time()
        n = (
            spark.read.parquet(out_dir)
            .select(F.col("batch").cast("bigint"), "doc_id")
            .localCheckpoint(eager=True)
            .count()
        )
        print(
            f"## final read+checkpoint: {time.time() - t0:.3f}s "
            f"({n} rows)",
            file=sys.stderr,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    wall = time.time() - t_total

    print(f"\n{'seq':>3} {'phase':<10} {'op':<16} {'site':<28} sec")
    tracked = 0.0
    for seq, phase, op, site, sec in RECORDS:
        print(f"{seq:>3} {phase:<10} {op:<16} {site:<28} {sec:.3f}")
        tracked += sec
    print(f"\nwall total: {wall:.3f}s; tracked in jobs: {tracked:.3f}s")
    by = {}
    for _, phase, op, site, sec in RECORDS:
        by[(phase,)] = by.get((phase,), 0) + sec
    print("per-phase job seconds:")
    for k in sorted(by):
        print(f"  {k[0]:<12} {by[k]:.3f}")
    by2 = {}
    for _, phase, op, site, sec in RECORDS:
        by2[(op, site)] = by2.get((op, site), 0) + sec
    print("per-site job seconds (summed over batches):")
    for k, v in sorted(by2.items(), key=lambda kv: -kv[1]):
        print(f"  {k[0]:<16} {k[1]:<28} {v:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
