"""Sink helpers.

The reference's only sink is its cache writer (pickle / HF
save_to_disk, reference cache.py:190-201).  A Spark engine wants real
warehouse sinks: partitioned/bucketed parquet for co-located downstream
joins, plus CSV/JSONL for interchange.

Scale notes
-----------
* ``partition_by`` prunes downstream scans (partition pruning is free
  predicate pushdown at the directory level).
* ``bucket_by`` pre-shuffles on the join key at write time so
  bucket-aware readers join without a shuffle — worth it for tables
  joined repeatedly on the same key (requires ``saveAsTable``).
* ``max_records_per_file`` bounds file sizes so a 100 TB write does not
  produce multi-GB unsplittable-row-group files.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: Sequence[str] = (),
    max_records_per_file: Optional[int] = None,
    compression: str = "zstd",
) -> None:
    writer = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] = (),
    mode: str = "error",
) -> None:
    """Bucketed managed table: co-locates rows by join key so repeated
    joins/aggregations on ``bucket_by`` skip their shuffle."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "error",
    compression: Optional[str] = "gzip",
) -> None:
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "error",
    header: bool = True,
    compression: Optional[str] = None,
) -> None:
    writer = df.write.mode(mode).option("header", header)
    if compression:
        writer = writer.option("compression", compression)
    writer.csv(path)
