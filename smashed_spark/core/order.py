"""Ordering utilities.

The reference's datasets are implicitly ordered sequences, and several
operators are order-*sensitive* (SURVEY.md §2.5, risk register §7.1):
``FixedBatchSizeMapper``, ``FewShotJinjaMapper``,
``EnumerateFieldMapper(same_id_for_repeated=True)``.  Spark DataFrames
are unordered, so order-sensitive mappers require an explicit ordering
column.

Scale notes
-----------
``row_number()`` over an un-partitioned window collapses to a single
task — unusable at 100 TB.  ``with_row_index`` instead uses the
two-phase trick: per-partition sequential ids + a tiny driver-side
cumulative-offset map (one count per partition, i.e. KB-sized even with
100k partitions).  When the data has a natural total order (a key
column), prefer ``sort_by`` + that key directly; the synthetic index is
only for "encounter order" parity with the reference.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ROW_ID = "__row_id__"


def with_row_index(
    df: DataFrame,
    order_by: Optional[Sequence[str]] = None,
    col_name: str = ROW_ID,
) -> DataFrame:
    """Add a 0-based contiguous global row index.

    If ``order_by`` is given the index follows that ordering using a
    range-partitioned sort (Spark's global ``orderBy``) followed by the
    two-phase per-partition assignment — no single-task bottleneck.
    Without ``order_by`` the index reflects current partition order
    (deterministic for deterministic inputs such as parquet scans).
    """
    if order_by:
        df = df.orderBy(*order_by)

    spark = df.sparkSession
    schema = df.schema

    # Phase 1: count rows per partition (cheap action over counts only).
    sizes = df.rdd.mapPartitionsWithIndex(
        lambda pid, it: [(pid, sum(1 for _ in it))]
    ).collect()
    offsets = {}
    acc = 0
    for pid, n in sorted(sizes):
        offsets[pid] = acc
        acc += n
    b_offsets = spark.sparkContext.broadcast(offsets)

    # Phase 2: per-partition sequential assignment (narrow, no shuffle).
    def assign(pid, it):
        base = b_offsets.value[pid]
        for i, row in enumerate(it):
            yield (*row, base + i)

    rdd = df.rdd.mapPartitionsWithIndex(assign, preservesPartitioning=True)
    from pyspark.sql.types import LongType, StructField, StructType

    new_schema = StructType(list(schema.fields) + [StructField(col_name, LongType(), False)])
    return spark.createDataFrame(rdd, new_schema)


def with_order_key(
    df: DataFrame, order_by: Sequence[str], col_name: str = ROW_ID
) -> DataFrame:
    """Row index via a window over an explicit key ordering.

    Single-task for the un-partitioned window — fine at test scale and
    for oracle parity; at 100 TB use :func:`with_row_index` instead.
    Kept because it is fully deterministic given a total-order key and
    avoids the RDD round-trip (keeps the plan in Catalyst).
    """
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(col_name, F.row_number().over(w) - F.lit(1))
