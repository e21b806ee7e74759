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
    quantile_mode: str = "approx",
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

    ``quantile_mode`` picks the quantile tier (the calibrate.py
    exact/approx pattern):

    * ``"approx"`` (default, the 100 TB path) — mergeable GK sketches
      via ``percentile_approx``, partial-aggregated inside the same
      single pass as every other statistic; rank error bounded by
      ``1/accuracy``.
    * ``"exact"`` — one EXTRA bounded job: all numeric columns' values
      exchange ONCE partitioned by column index, a shared
      ``row_number``+``count`` window pair ranks each partition, and
      only the ``ceil(q*n)``-th rows (the discrete lower-quantile
      order statistic, ``<= columns x quantiles`` rows total) come
      back.  Deterministic and engine-replayable (ties are
      value-identical at any rank inside a tie run, so row_number's
      arbitrary tie order cannot change the answer).  The documented
      bound is parallelism: one partition PER COLUMN, so a
      billion-row column funnels through one task — audit-scale
      exactness, not the streaming default (same trade as
      calibrate_thresholds(exact=True)).
    """
    if not quantiles or not all(0.0 <= q <= 1.0 for q in quantiles):
        raise ValueError(f"quantiles must be in [0, 1]: {quantiles!r}")
    if quantile_mode not in ("approx", "exact"):
        raise ValueError(
            f"quantile_mode must be 'approx' or 'exact', got "
            f"{quantile_mode!r}"
        )
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
            ]
            if quantile_mode == "approx":
                aggs.append(
                    F.percentile_approx(
                        v, F.array(*[F.lit(q) for q in quantiles]),
                        F.lit(accuracy),
                    ).alias(f"{c}!q")
                )
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

    # r16: the three audit passes (scalar aggregate, exact quantiles,
    # KMV candidates) are mutually independent reads of the same input
    # — submit them from a driver thread pool so each job's task tail
    # back-fills the others (the optimization playbook's concurrent-
    # jobs idiom).  The empty-corpus short-circuit is preserved by
    # DISCARDING the quantile/KMV results when the count comes back 0
    # (on an empty frame those jobs are no-op-cheap, so running them
    # speculatively costs nothing).
    from concurrent.futures import ThreadPoolExecutor

    numeric = [c for c in names if isinstance(by_name[c], _NUMERIC)]
    kmv_cols = [c for c in scalar if not isinstance(by_name[c], T.BooleanType)]
    with ThreadPoolExecutor(max_workers=3) as pool:
        f_row = pool.submit(lambda: df.agg(*aggs).collect()[0])
        f_q = (
            pool.submit(_exact_quantiles, df, numeric, quantiles)
            if quantile_mode == "exact" and numeric
            else None
        )
        f_kmv = (
            pool.submit(kmv_sketch_multi, df, kmv_cols, kmv_k)
            if kmv_cols
            else None
        )
        row = f_row.result()
        n_rows = row["__n__"]
        # the speculative futures are always .result()'ed (r17, ADVICE):
        # the pool shutdown blocks on them either way, so a real failure
        # (executor/storage error) must surface, not be silently
        # swallowed.  Only on a PROVEN-empty corpus (n_rows == 0, where
        # the speculative jobs' values are discarded anyway) is a
        # failure in them ignorable.
        exact_q: dict = {}
        if f_q is not None:
            try:
                q_res = f_q.result()
            except Exception:
                if n_rows:
                    raise
            else:
                if n_rows:
                    exact_q = q_res
        est: dict = {}
        if f_kmv is not None:
            try:
                kmv_res = f_kmv.result()
            except Exception:
                if n_rows:
                    raise
            else:
                if n_rows:
                    est = {
                        c: float(sk.estimate())
                        for c, sk in kmv_res.items()
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
                    exact_q.get(c)
                    if quantile_mode == "exact"
                    else (
                        list(d[f"{c}!q"])
                        if d.get(f"{c}!q") is not None
                        else None
                    )
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


def _exact_quantiles(
    df: DataFrame,
    numeric: Sequence[str],
    quantiles: Tuple[float, ...],
) -> dict:
    """Exact discrete quantiles (the ``ceil(q*n)``-th smallest
    non-NULL non-NaN value) for every numeric column in ONE job.

    Plan: a per-row array of ``(cidx, value)`` structs (NULL/NaN
    compacted out) explodes to slim pairs, which exchange ONCE
    partitioned by column index; a shared-partitioning
    ``row_number`` + ``count`` window pair (the calibrate.py exact
    tier's shape — the count rides the rank's exchange) marks each
    partition's target ranks in-plan, and only those rows are
    collected (``<= len(numeric) x len(quantiles)``).  The target
    rank is computed as ``ceil(q * n)`` in DOUBLE arithmetic on both
    the Spark side and any replaying engine — IEEE multiplication and
    ceil agree bit-for-bit, so oracles replay it with the same
    expression.  Ties cannot perturb the answer: every rank inside a
    tie run holds the same value."""
    from pyspark.sql.window import Window

    pairs = df.select(
        F.explode(
            F.array_compact(
                F.array(
                    *[
                        F.when(
                            F.col(c).isNotNull()
                            & ~F.isnan(F.col(c).cast("double")),
                            F.struct(
                                F.lit(i).alias("cidx"),
                                F.col(c).cast("double").alias("v"),
                            ),
                        )
                        for i, c in enumerate(numeric)
                    ]
                )
            )
        ).alias("p")
    ).select("p.cidx", "p.v")
    w_rank = Window.partitionBy("cidx").orderBy("v")
    w_part = Window.partitionBy("cidx")
    ranked = pairs.select(
        "cidx",
        "v",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_part).alias("n"),
    )
    hit = None
    for q in quantiles:
        cond = F.col("rn") == F.greatest(
            F.lit(1), F.ceil(F.lit(float(q)) * F.col("n"))
        )
        hit = cond if hit is None else (hit | cond)
    rows = ranked.where(hit).collect()
    by_col: dict = {}
    for r in rows:
        by_col.setdefault(int(r["cidx"]), {})[int(r["rn"])] = (
            float(r["v"]),
            int(r["n"]),
        )
    import math

    out = {}
    for i, c in enumerate(numeric):
        got = by_col.get(i)
        if not got:
            out[c] = None
            continue
        n = next(iter(got.values()))[1]
        out[c] = [
            got[max(1, math.ceil(q * float(n)))][0] for q in quantiles
        ]
    return out
