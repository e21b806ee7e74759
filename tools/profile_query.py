#!/usr/bin/env python
"""Time individual gate queries standalone (same session config as
bench.py) to separate inherent query cost from shared-session pressure.

Usage: python tools/profile_query.py [-n REPS] q1 [q2 ...]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    reps = 1
    if "-n" in sys.argv:
        reps = int(sys.argv[sys.argv.index("-n") + 1])
        args.remove(str(reps))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("smashed_spark-profile")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry_mod

    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    queries = entry_mod.queries()
    for name in args:
        fn = queries[name]
        for i in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            print(f"{name}[{i}]: {dt:.3f}s rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
