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
from pyspark.sql import functions as F


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


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: Sequence[str] = (),
    compression: str = "zstd",
) -> None:
    """ORC sink (Spark-native, no external package) — the interchange
    format for Hive/Trino-side consumers the same way parquet serves
    Spark-side ones.  Avro, by contrast, is an EXTERNAL Spark module
    (spark-avro jar): absent from this environment, so there is
    deliberately no write_avro here — with the jar deployed it is
    ``df.write.format("avro")``, nothing this module would add."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def shard_for_training(
    df: DataFrame,
    key_field: str,
    n_shards: int,
    seed: int = 13,
    shard_column: str = "shard",
    rank_column: str = "shard_rank",
) -> DataFrame:
    """Deterministic training-shard assignment + within-shard shuffle
    order — the export step of a curation pipeline: training loaders
    consume fixed-count shard files in a reproducible pseudo-random
    order, so both the shard a document lands in and its position
    inside the shard must be pure functions of the data.

    * ``shard = portable_hash60(key ":" seed) mod n_shards`` — narrow,
      append-stable (a new document never moves an old one), and the
      same md5 convention as ``sample_mix(method='hash')`` /
      ``hash_split``, so the whole mix→cap→split→shard chain is
      engine-replayable.
    * ``rank_column = row_number()`` within the shard, ordered by an
      independent order hash (``key ":" seed ":order"``) then the key —
      a seeded shuffle of the shard's rows (hash order ≈ random order,
      the standard trick for training-order randomization without a
      global sort) — then an ``xxhash64`` over ALL columns as the final
      tiebreak: both hashes are pure functions of the key, so two
      different rows sharing a key would otherwise rank in
      partition-arrival order.  With the content tiebreak the rank is a
      pure function of the data even for duplicate-key rows; only fully
      identical rows (interchangeable by definition, plus the
      astronomically-unlikely 64-bit content collision) still tie.

    Scale: ONE exchange on the shard key; each shard sorts
    independently (corpus/n_shards rows per task — grow ``n_shards``
    with the corpus so a shard stays one task's worth, which is also
    what makes each shard one well-sized output file).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from pyspark.sql.window import Window

    from ..functions.hashing import portable_hash60

    key = F.col(key_field).cast("string")
    shard = F.pmod(
        portable_hash60(F.concat_ws(":", key, F.lit(str(seed)))),
        F.lit(n_shards),
    ).cast("int")
    order = portable_hash60(
        F.concat_ws(":", key, F.lit(f"{seed}:order"))
    )
    out = df.withColumn(shard_column, shard)
    # hash every hashable column (xxhash64 rejects MapType at ANY
    # nesting depth; a row differing ONLY in a map column still ties —
    # document-corpus schemas key their payload in atomic/array/struct
    # columns)
    from ..functions.hashing import contains_map_type

    hashable = [
        f.name for f in df.schema.fields
        if not contains_map_type(f.dataType)
    ]
    content = (
        F.xxhash64(*[F.col(c) for c in hashable])
        if hashable
        else F.lit(0)
    )
    w = Window.partitionBy(shard_column).orderBy(
        order.asc(), F.col(key_field).asc(), content.asc()
    )
    return out.withColumn(rank_column, F.row_number().over(w))


def write_training_shards(
    df: DataFrame,
    path: str,
    key_field: str,
    n_shards: int,
    seed: int = 13,
    mode: str = "error",
) -> None:
    """Materialize :func:`shard_for_training`: one directory per shard
    (``shard=N/``), rows stored in shard-rank order so a sequential
    reader replays the deterministic shuffle.  ``repartition`` on the
    shard value co-locates each shard in one task before the
    partitioned write."""
    sharded = shard_for_training(df, key_field, n_shards, seed=seed)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shard_rank")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
