"""One-pass corpus profiling: the "what is in this table" audit a
data owner runs before (and after) every curation step — per-column
null rates, cardinality estimates, numeric moments + quantile
sketches, string lengths — at 100 TB cost: TWO bounded jobs total,
however many columns.

* Job 1 — ONE global aggregate pass computes every native statistic
  for every profiled column in a single ``.agg`` (count/nulls,
  min/max, mean/stddev, mergeable ``percentile_approx`` sketches for
  numerics, avg/max length for strings).  A global aggregate's
  exchange moves one partial-state row per partition — KBs.
* Job 2 — :func:`~smashed_spark.functions.sketches.kmv_sketch_multi`
  adds per-column distinct estimates, also one pass for all columns
  (its own documented single-exchange shape).

The result is a driver-assembled long-format DataFrame (one row per
column) — O(columns) rows, safe to collect/show/join.  Complex-typed
columns (arrays/structs/maps/binary) get counts and nulls only;
profiling inside nested values is a projection the caller makes
explicit (explode costs must never hide in an audit helper).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .sketches import kmv_sketch_multi

__all__ = ["profile_corpus"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_ORDERED_EXTRA = (T.StringType, T.DateType, T.TimestampType)


def profile_corpus(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    quantiles: Tuple[float, ...] = (0.25, 0.5, 0.75, 0.99),
    kmv_k: int = 256,
    accuracy: int = 10_000,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` into one row per
    column: ``(column, dtype, n_rows, n_nulls, null_frac,
    est_distinct, min_value, max_value, mean, stddev, avg_len,
    quantiles)``.

    ``min_value``/``max_value`` are stringified (one schema across
    column types); ``mean``/``stddev``/``quantiles`` are NULL for
    non-numeric columns, ``avg_len`` NULL for non-strings,
    ``est_distinct`` NULL for complex types (KMV hashes scalar
    values).  NaNs in numeric columns are excluded from moments and
    quantiles the same way NULLs are (``isnan`` guard) — a poisoned
    mean would hide exactly the rows an audit exists to find.
    """
    if not quantiles or not all(0.0 <= q <= 1.0 for q in quantiles):
        raise ValueError(f"quantiles must be in [0, 1]: {quantiles!r}")
    names = list(columns) if columns is not None else list(df.columns)
    missing = [c for c in names if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    by_name = {f.name: f.dataType for f in df.schema.fields}

    aggs = [F.count(F.lit(1)).alias("__n__")]
    scalar: List[str] = []
    for c in names:
        dt = by_name[c]
        col = F.col(c)
        aggs.append(F.count(col).alias(f"{c}!nn"))
        if isinstance(dt, _NUMERIC):
            v = col.cast("double")
            v = F.when(~F.isnan(v), v)
            # min/max over the NaN-normalized value for FLOATING
            # columns: Spark orders NaN above every double, so raw max
            # would report the string 'NaN' and mask the true maximum —
            # the same poisoning the docstring promises to exclude from
            # the moments.  Integer/decimal columns cannot hold NaN and
            # keep their native rendering ("5", not "5.0").
            mcol = (
                v if isinstance(dt, (T.FloatType, T.DoubleType)) else col
            )
            aggs += [
                F.min(mcol).cast("string").alias(f"{c}!min"),
                F.max(mcol).cast("string").alias(f"{c}!max"),
                F.avg(v).alias(f"{c}!mean"),
                F.stddev_samp(v).alias(f"{c}!std"),
                F.percentile_approx(
                    v, F.array(*[F.lit(q) for q in quantiles]),
                    F.lit(accuracy),
                ).alias(f"{c}!q"),
            ]
            scalar.append(c)
        elif isinstance(dt, T.StringType):
            aggs += [
                F.min(col).alias(f"{c}!min"),
                F.max(col).alias(f"{c}!max"),
                F.avg(F.length(col)).alias(f"{c}!len"),
            ]
            scalar.append(c)
        elif isinstance(dt, _ORDERED_EXTRA) or isinstance(
            dt, (T.BooleanType,)
        ):
            aggs += [
                F.min(col).cast("string").alias(f"{c}!min"),
                F.max(col).cast("string").alias(f"{c}!max"),
            ]
            scalar.append(c)
        # complex types: counts/nulls only

    row = df.agg(*aggs).collect()[0]
    n_rows = row["__n__"]

    est = {}
    kmv_cols = [c for c in scalar if not isinstance(by_name[c], T.BooleanType)]
    if kmv_cols and n_rows:
        est = {
            c: float(sk.estimate())
            for c, sk in kmv_sketch_multi(df, kmv_cols, k=kmv_k).items()
        }

    out = []
    d = row.asDict()
    for c in names:
        nn = d[f"{c}!nn"]
        out.append(
            {
                "column": c,
                "dtype": by_name[c].simpleString(),
                "n_rows": n_rows,
                "n_nulls": n_rows - nn,
                "null_frac": (
                    (n_rows - nn) / n_rows if n_rows else None
                ),
                "est_distinct": est.get(c),
                "min_value": d.get(f"{c}!min"),
                "max_value": d.get(f"{c}!max"),
                "mean": d.get(f"{c}!mean"),
                "stddev": d.get(f"{c}!std"),
                "avg_len": d.get(f"{c}!len"),
                "quantiles": (
                    list(d[f"{c}!q"]) if d.get(f"{c}!q") is not None
                    else None
                ),
            }
        )
    schema = (
        "column string, dtype string, n_rows bigint, n_nulls bigint, "
        "null_frac double, est_distinct double, min_value string, "
        "max_value string, mean double, stddev double, avg_len double, "
        "quantiles array<double>"
    )
    return df.sparkSession.createDataFrame(
        [tuple(r.values()) for r in out], schema
    )
