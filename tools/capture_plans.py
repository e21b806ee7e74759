#!/usr/bin/env python
"""Capture .explain("formatted") for gate queries into plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [q1 q2 ...]
  suffix: "before" or "after" — file name becomes plans/<round>/<q>_<suffix>.txt
  Round dir from $SMASHED_PLANS_ROUND (default r17).
  With no query names, captures every registered query.

Eager gates (snapshot_lifecycle, streaming_ingest_*) run their staged
work during construction; the captured plan is the final returned
DataFrame's — the same frame bench.py times with the noop sink.
"""

from __future__ import annotations

import io
import os
import sys
import traceback
from contextlib import redirect_stdout


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans",
        os.environ.get("SMASHED_PLANS_ROUND", "r17"))
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("smashed_spark-plans")
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

    queries = entry_mod.queries()
    for name in names or sorted(queries):
        fn = queries[name]
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"{name}: {path}", flush=True)
        except Exception:
            print(f"{name}: FAILED\n{traceback.format_exc()}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
