"""Per-group quality-threshold calibration: pick the score cutoff that
retains a target fraction of each group — the "keep the best X% per
source" curation step that sits between quality scoring
(:mod:`~smashed_spark.functions.textstats`,
:mod:`~smashed_spark.functions.classifier`) and token budgeting
(:func:`~smashed_spark.sources.loaders.select_under_token_budget`).
The reference has no corpus-curation surface (additive, SURVEY.md
§2.10); the operation itself is the standard per-source quantile
filter of CCNet / RefinedWeb-style pipelines.

Two tiers, selected by ``exact``:

* ``exact=True`` (the correctness-gate tier): the threshold is the
  k-th LARGEST score of the group, ``k = ceil(retain * n - 1e-9)``
  (the epsilon keeps exact multiples like ``0.5 * 4`` from tipping
  over on float rounding — the same arithmetic replays in any SQL
  engine bit-for-bit).  Cost: ONE exchange of the slim
  ``(group, score)`` projection — the rank window and the per-group
  count window share the same partitioning, so Catalyst plans a
  single Exchange (plan-spy pinned in tests/test_calibrate.py).  The
  k-th order statistic is tie-invariant, so row_number's arbitrary
  ordering among equal scores cannot change the threshold VALUE.
  A global (``by=None``) exact calibration sorts the whole slim frame
  in one task — use the approx tier for global cutoffs at scale.

* ``exact=False`` (the 100 TB tier): ``percentile_approx(score,
  1 - retain, accuracy)`` — Spark's Greenwald-Khanna sketch:
  mergeable, map-side partial aggregation, bounded memory per group
  regardless of group size, rank error ≤ n/accuracy.  At 10^9 docs
  and ``accuracy=10_000`` the retained fraction is within ±0.01% of
  the target while the exchange carries only KB-sized sketches.

Score-column hygiene (both tiers): the score is cast to double and
NaN is normalized to NULL in the slim projection (the ``nanvl``
convention of graph.py's quality representatives) — NULL/NaN-scored
rows neither influence the threshold nor survive the filter, because
``score >= threshold`` is NULL.  Groups whose every score is NULL get
a NULL threshold and retain nothing.

``select_top_fraction`` applies the thresholds back with a
``broadcast()`` left join on the group keys — thresholds are one row
per group (bounded by the source vocabulary), so the corpus side
never exchanges.  The threshold branch re-evaluates ``df``'s lineage
column-pruned to ``(group, score)``: two scans, but the only data
that ever crosses an exchange is the slim projection.  The
alternative — a rank window over the single full frame — would
exchange AND sort the corpus at full row width (text included), which
is the wrong trade at 100 TB; callers who already persist their
scored corpus get the single-scan behavior for free.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["calibrate_thresholds", "select_top_fraction"]

# float-rounding guard for k = ceil(retain * n): keeps exact products
# (0.5 * 4 = 2.0) from tipping to 3 when the binary product lands an
# ulp above the integer.  Any SQL oracle must subtract the same
# epsilon — IEEE doubles make the arithmetic engine-portable.
_K_EPS = 1e-9


def _slim_score(df: DataFrame, score_field: str, by: Sequence[str]) -> DataFrame:
    s = F.col(score_field).cast("double")
    # NaN -> NULL so ordering/quantiles never see NaN (Spark sorts NaN
    # LAST descending; DuckDB sorts it first — normalizing is the only
    # engine-portable semantics).
    s = F.when(~F.isnan(s), s).otherwise(F.lit(None))
    return df.select(*by, s.alias("__score__"))


def calibrate_thresholds(
    df: DataFrame,
    score_field: str,
    retain: float,
    by: Union[str, Sequence[str], None] = None,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group score cutoffs retaining ~``retain`` of each group.

    Returns one row per group: ``(*by, threshold double)`` (a single
    global row when ``by`` is None).  Keeping ``score >= threshold``
    retains ``ceil(retain * n - eps)`` rows per group in the exact
    tier (ties at the threshold may retain more — the filter is on the
    VALUE, deterministically), and ``retain ± n/accuracy`` in the
    approx tier.  ``retain`` must be in (0, 1]; every non-empty group
    retains at least one row.
    """
    if not 0.0 < retain <= 1.0:
        raise ValueError(f"retain must be in (0, 1], got {retain!r}")
    if score_field not in df.columns:
        raise ValueError(f"score_field {score_field!r} not in {df.columns}")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    slim = _slim_score(df, score_field, by_cols)

    if not exact:
        if accuracy < 100:
            raise ValueError(f"accuracy must be >= 100, got {accuracy}")
        # GK sketch at quantile (1 - retain) from below == keep the top
        # `retain` fraction from above.  retain == 1.0 -> p = 0 -> min.
        return slim.groupBy(*by_cols).agg(
            F.percentile_approx(
                "__score__", F.lit(1.0 - retain), F.lit(accuracy)
            ).alias("threshold")
        )

    w_part = Window.partitionBy(*by_cols)
    w_rank = w_part.orderBy(F.col("__score__").desc_nulls_last())
    n = F.count("__score__").over(w_part)  # count(col): NULLs excluded
    k = F.greatest(
        F.lit(1),
        F.ceil(F.lit(retain) * n.cast("double") - F.lit(_K_EPS)).cast("int"),
    )
    ranked = slim.select(
        *by_cols,
        F.col("__score__"),
        F.row_number().over(w_rank).alias("__rn__"),
        k.alias("__k__"),
    )
    # one row per group survives (row_number is unique); groups that
    # are all-NULL keep rn=1 with a NULL score -> NULL threshold.
    return ranked.filter(F.col("__rn__") == F.col("__k__")).select(
        *by_cols, F.col("__score__").alias("threshold")
    )


def select_top_fraction(
    df: DataFrame,
    score_field: str,
    retain: float,
    by: Union[str, Sequence[str], None] = None,
    exact: bool = False,
    accuracy: int = 10_000,
    keep_field: Optional[str] = None,
    threshold_field: Optional[str] = None,
) -> DataFrame:
    """Filter (or flag) the top ``retain`` fraction of each group by
    ``score_field``.

    The thresholds frame (one row per group) is ``broadcast()``
    joined back — the corpus side stays exchange-free.  With
    ``keep_field`` set, rows are FLAGGED (1/0 int) instead of
    filtered; ``threshold_field`` additionally exposes the group's
    cutoff as a column (handy for audit output).  NULL/NaN scores are
    never kept.
    """
    by_cols = [by] if isinstance(by, str) else list(by or [])
    thr = calibrate_thresholds(
        df, score_field, retain, by=by_cols, exact=exact, accuracy=accuracy
    )
    score = F.col(score_field).cast("double")
    # NaN -> NULL here too: Spark orders NaN above every double, so a
    # raw `NaN >= threshold` would be TRUE and leak NaN rows through.
    score = F.when(~F.isnan(score), score)
    keep: Column = F.coalesce(score >= F.col("__thr__"), F.lit(False))
    thr = thr.withColumnRenamed("threshold", "__thr__")
    if by_cols:
        # NULL-SAFE join keys: calibrate_thresholds treats a NULL
        # group key as a real group (groupBy/Window semantics), so the
        # join-back must too — a null-unsafe `on=by_cols` would never
        # match the NULL group's threshold row and silently drop that
        # entire partition of the corpus
        thr = thr.select(
            *[F.col(c).alias(f"__g_{c}__") for c in by_cols], "__thr__"
        )
        cond = None
        for c in by_cols:
            eq = F.col(c).eqNullSafe(F.col(f"__g_{c}__"))
            cond = eq if cond is None else (cond & eq)
        joined = df.join(F.broadcast(thr), on=cond, how="left").drop(
            *[f"__g_{c}__" for c in by_cols]
        )
    else:
        joined = df.crossJoin(F.broadcast(thr))
    out_cols = list(df.columns)
    if threshold_field is not None:
        joined = joined.withColumn(threshold_field, F.col("__thr__"))
        out_cols.append(threshold_field)
    if keep_field is not None:
        joined = joined.withColumn(keep_field, keep.cast("int"))
        out_cols.append(keep_field)
    else:
        joined = joined.filter(keep)
    return joined.select(*out_cols)
