"""Input-parallelism repair for unsplittable small scans.

A parquet file is splittable only at row-group boundaries; a table
written as one file with one row group yields a ONE-task scan whatever
the cluster width, and every narrow stage above it (per-row hashing,
shingling, regex scoring) runs on a single core.  That is the
"one huge unsplittable file" input-skew case of the optimization
playbook: *repartition immediately after the read*.

``ensure_min_parallelism`` is the scale-adaptive form of that fix: a
no-op whenever the frame is already at least as wide as the session's
default parallelism (the 100 TB case — real corpora scan as thousands
of splits), a single round-robin exchange of the (by premise small)
input when it is not.  The target derives from
``sparkContext.defaultParallelism``, never a constant, so the same
code is right at local[4], local[32], and on a cluster.

Call it on a scan-rooted frame AFTER cheap filters/projections (so
predicate pushdown and column pruning still reach the scan, and the
exchange moves only surviving bytes) and BEFORE expression-heavy
per-row work.  Do NOT use it where downstream values depend on
encounter order (``with_row_index`` without ``order_by``): a
repartition reorders rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_min_parallelism"]


def ensure_min_parallelism(df: DataFrame, multiple: int = 1) -> DataFrame:
    """Round-robin repartition ``df`` up to ``defaultParallelism *
    multiple`` partitions iff it currently has fewer — identity
    otherwise.

    Safe only on frames whose physical plan has no shuffle below this
    point (scan + filter/project): the partition-count probe builds
    the plan's RDD, which under AQE would *execute* any upstream query
    stages.  All call sites in this repo apply it directly above a
    parquet scan.
    """
    sc = df.sparkSession.sparkContext
    want = max(1, sc.defaultParallelism * multiple)
    if df.rdd.getNumPartitions() >= want:
        return df
    return df.repartition(want)
