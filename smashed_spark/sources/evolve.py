"""Schema evolution across corpus snapshots.

Beyond-reference surface: a corpus that lives for years accumulates
snapshots written under drifting schemas — a column added in 2023, an
id widened from int to bigint in 2024, a score that was float once.
At 100 TB you cannot "just rewrite" history every time a field moves;
you need to (a) SEE the drift cheaply and (b) READ across it safely.

* :func:`schema_drift` — the audit: per-file physical schemas from
  parquet FOOTERS, distributed exactly like layout.scan_stats (file
  list as a DataFrame, pyarrow footer reads in ``mapInPandas`` — KB
  per file, no data read), plus :func:`drift_summary` folding it to
  one row per (column, type) with file counts — "which files disagree
  and how" before any read is attempted;
* :func:`align_to_schema` — the read-side contract: project any frame
  onto a target schema with EXPLICIT policies — missing columns
  become typed NULLs (or raise), extra columns are dropped (or kept,
  or raise), and type mismatches go through a SAFE-cast matrix:
  lossless widenings (byte→short→int→long, int→double exactly up to
  2^31, float→double, anything→string) pass; lossy ones
  (long→int, double→float, string→int, long→double past 2^53) RAISE
  unless ``cast="force"`` — the house stance: silent truncation in a
  100 TB read is unfindable later;
* :func:`read_evolved` — the one-call read: each snapshot directory
  aligned to the target, then ``unionByName`` — NOT one
  ``mergeSchema`` read, because parquet's merge refuses same-column
  TYPE changes (int→bigint raises CANNOT_MERGE_SCHEMAS), and a type
  widening across generations is exactly the drift being read over.

Scale notes: alignment is pure projection (zero exchanges, rides the
scan, pushdown-preserving — Catalyst still prunes the unified read
schema down to the target's columns); the drift audit is one narrow
``mapInPandas`` over the file LIST, never the data.
"""

from __future__ import annotations

from typing import Dict, List, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# lossless widenings (beyond identity): value-preserving for every
# possible input value of the source type.  Names are simpleString()
# DDL spellings (tinyint/smallint/int/bigint — NOT the internal
# byte/short/long names)
_SAFE_WIDENINGS = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("tinyint", "float"), ("tinyint", "double"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("smallint", "float"), ("smallint", "double"),
    ("int", "bigint"), ("int", "double"),
    ("bigint", "decimal(38,0)"),
    ("float", "double"),
    ("date", "timestamp"),
}


def _simple(dt: T.DataType) -> str:
    return dt.simpleString()


def is_safe_cast(src: T.DataType, dst: T.DataType) -> bool:
    """True when every value of ``src`` survives a cast to ``dst``
    unchanged.  Notable NON-safe pairs this refuses that Spark would
    happily cast: long→int (truncates), double→float (rounds),
    long→double and int→float (lossy past the mantissa: 2^53 / 2^24),
    string→anything (parse failures become NULL silently),
    timestamp→date (drops time).  anything→string is allowed — the
    representation changes but no value is lost."""
    s, d = _simple(src), _simple(dst)
    if s == d:
        return True
    if d == "string" and not isinstance(
        src, (T.StructType, T.ArrayType, T.MapType)
    ):
        return True
    return (s, d) in _SAFE_WIDENINGS


def align_to_schema(
    df: DataFrame,
    target: Union[str, T.StructType],
    missing: str = "null",
    extra: str = "drop",
    cast: str = "safe",
) -> DataFrame:
    """Project ``df`` onto ``target`` (DDL string or StructType) —
    pure projection, zero exchanges, column order normalized to the
    target's.

    Policies (each silent behavior is an explicit choice):

    * ``missing``: ``"null"`` adds absent target columns as typed
      NULLs; ``"error"`` raises.
    * ``extra``: ``"drop"`` discards non-target columns; ``"keep"``
      appends them after the target columns; ``"error"`` raises.
    * ``cast``: ``"safe"`` allows only value-preserving casts (see
      :func:`is_safe_cast`) and RAISES on lossy ones, naming the
      column and both types; ``"force"`` casts regardless (Spark
      semantics: overflow wraps/truncates, unparseable strings go
      NULL — own that explicitly); ``"error"`` requires exact type
      equality.
    """
    if isinstance(target, str):
        target = T.StructType.fromDDL(target)
    if missing not in ("null", "error"):
        raise ValueError(f"align_to_schema: missing={missing!r}")
    if extra not in ("drop", "keep", "error"):
        raise ValueError(f"align_to_schema: extra={extra!r}")
    if cast not in ("safe", "force", "error"):
        raise ValueError(f"align_to_schema: cast={cast!r}")

    # name resolution is case-INSENSITIVE, matching Spark's default
    # resolver (spark.sql.caseSensitive=false): a snapshot written as
    # DOC_ID must align to a doc_id target, not be silently NULLed as
    # "missing" while DOC_ID is dropped as an "extra" — exactly the
    # silent loss this module exists to prevent
    have = {f.name.lower(): (f.name, f.dataType) for f in df.schema.fields}
    cols: List = []
    for f in target.fields:
        hit = have.get(f.name.lower())
        if hit is None:
            if missing == "error":
                raise ValueError(
                    f"align_to_schema: column {f.name!r} "
                    f"({_simple(f.dataType)}) missing from input "
                    f"(columns: {df.columns})"
                )
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        in_name, src = hit
        if _simple(src) == _simple(f.dataType):
            cols.append(F.col(in_name).alias(f.name))
        else:
            if cast == "error":
                raise ValueError(
                    f"align_to_schema: column {f.name!r} is "
                    f"{_simple(src)}, target wants "
                    f"{_simple(f.dataType)} (cast='error')"
                )
            if cast == "safe" and not is_safe_cast(src, f.dataType):
                raise ValueError(
                    f"align_to_schema: cast {f.name!r} "
                    f"{_simple(src)} -> {_simple(f.dataType)} is "
                    "LOSSY (overflow/rounding/parse-null) — widen "
                    "the target type, or pass cast='force' to own "
                    "the loss explicitly"
                )
            cols.append(F.col(in_name).cast(f.dataType).alias(f.name))
    target_lower = {f.name.lower() for f in target.fields}
    extras = [c for c in df.columns if c.lower() not in target_lower]
    if extras:
        if extra == "error":
            raise ValueError(
                f"align_to_schema: unexpected columns {extras} "
                "(extra='error')"
            )
        if extra == "keep":
            cols.extend(F.col(c) for c in extras)
    return df.select(*cols)


def read_evolved(
    spark: SparkSession,
    paths: Union[str, List[str]],
    target: Union[str, T.StructType],
    missing: str = "null",
    extra: str = "drop",
    cast: str = "safe",
) -> DataFrame:
    """Read one or many parquet snapshot directories written under
    drifting schemas, aligned to ``target``.

    Shape: each snapshot is read, aligned (:func:`align_to_schema` —
    so the safe-cast policy applies per snapshot, naming the offender)
    and the aligned frames ``unionByName``.  NOT one ``mergeSchema``
    read across all paths: parquet's merge unions column SETS but
    REFUSES same-column type changes (int→bigint raises
    CANNOT_MERGE_SCHEMAS — measured, Spark 4.1), and a type widening
    across snapshot generations is exactly the drift this function
    exists for.  Within one snapshot directory ``mergeSchema`` is
    still used, so per-file column additions inside a snapshot work;
    a TYPE conflict inside one directory is a data bug this read
    surfaces as Spark's own merge error.

    Cost identical to the merged read (every byte scanned once, one
    scan node per snapshot, no exchange — union is not a shuffle),
    and Catalyst pushes the target projection into each scan."""
    if isinstance(paths, str):
        paths = [paths]
    if not paths:
        raise ValueError(
            "read_evolved: empty paths list — the discovery/glob step "
            "found no snapshots"
        )
    aligned = [
        align_to_schema(
            spark.read.option("mergeSchema", "true").parquet(p),
            target,
            missing=missing,
            extra=extra,
            cast=cast,
        )
        for p in paths
    ]
    out = aligned[0]
    for df in aligned[1:]:
        out = out.unionByName(df)
    return out


_DRIFT_SCHEMA = (
    "file string, col string, physical_type string, "
    "logical_type string, num_rows bigint"
)


def schema_drift(
    spark: SparkSession,
    paths: Union[str, List[str]],
) -> DataFrame:
    """Per-(file, column) physical schema from parquet footers,
    distributed (the layout.scan_stats shape: file list → DataFrame →
    pyarrow footer reads in ``mapInPandas``).  ``logical_type`` is
    the pyarrow/arrow reading of the column (what Spark will see);
    ``physical_type`` the raw parquet storage type."""
    if isinstance(paths, str):
        paths = [paths]
    files: List[str] = []
    for p in paths:
        files.extend(spark.read.parquet(p).inputFiles())
    if not files:
        raise ValueError(f"schema_drift: no parquet files under {paths!r}")
    n_slices = max(
        1, min(len(files), spark.sparkContext.defaultParallelism * 4)
    )
    fdf = spark.createDataFrame(
        [(f,) for f in files], "file_path: string"
    ).repartition(n_slices)

    def _read_schemas(batches):
        import pandas as pd
        import pyarrow.fs as pafs
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for fp in pdf["file_path"]:
                fs, rel = pafs.FileSystem.from_uri(fp)
                with fs.open_input_file(rel) as fh:
                    pf = pq.ParquetFile(fh)
                    md = pf.metadata
                    arrow = pf.schema_arrow
                    phys = {
                        md.schema.column(i).name: md.schema.column(
                            i
                        ).physical_type
                        for i in range(md.num_columns)
                    }
                    for field in arrow:
                        rows.append(
                            {
                                "file": fp,
                                "col": field.name,
                                "physical_type": phys.get(
                                    field.name, ""
                                ),
                                "logical_type": str(field.type),
                                "num_rows": md.num_rows,
                            }
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file",
                    "col",
                    "physical_type",
                    "logical_type",
                    "num_rows",
                ],
            )

    return fdf.mapInPandas(_read_schemas, schema=_DRIFT_SCHEMA)


def drift_summary(drift: DataFrame) -> DataFrame:
    """Fold :func:`schema_drift` to one row per (column,
    logical_type): how many files carry the column at that type, how
    many rows that covers — the shape a migration decision reads.  A
    column whose name appears with >1 type, or whose file count is
    below the total, IS the drift.

    Fully lazy: the file total rides the same collection as the
    group counts (a broadcast cross-join of a one-row aggregate) —
    an eager ``count()`` here would run the whole distributed footer
    scan once for the total and AGAIN when the caller collects."""
    totals = drift.agg(
        F.countDistinct("file").alias("total_files")
    )
    return (
        drift.groupBy("col", "logical_type")
        .agg(
            F.countDistinct("file").alias("n_files"),
            F.sum("num_rows").alias("n_rows"),
        )
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "in_all_files", F.col("n_files") == F.col("total_files")
        )
        .orderBy("col", "logical_type")
    )
