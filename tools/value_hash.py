"""Per-query sorted-row value hash at any SF — the equivalence proof
harness for optimization work: run BEFORE and AFTER a plan-shape
change and diff the hashes (the driver's own canonicalization:
column-name-sorted, row-sorted, string-normalized).

Usage: python tools/value_hash.py out.json [q1 q2 ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
"""

import hashlib
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def main():
    out_path = sys.argv[1]
    names = sys.argv[2:]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("smashed_spark-value-hash")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    result = {}
    for name in names or sorted(queries):
        try:
            df = queries[name](spark, SF_DIR)
            cols = sorted(df.columns)
            rows = [tuple(norm(r[c]) for c in cols) for r in df.collect()]
            rows.sort(key=repr)
            h = hashlib.md5(repr(rows).encode()).hexdigest()
            result[name] = {"rows": len(rows), "cols": cols, "hash": h}
            print(f"{name}: {len(rows)} rows {h[:12]}", flush=True)
        except Exception as e:
            result[name] = {"err": str(e)[:300]}
            print(f"{name}: ERR {e}", flush=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
