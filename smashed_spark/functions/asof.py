"""As-of and range joins — temporal join operators Spark's optimizer
has no native node for (no reference counterpart: the reference engine
has no joins at all; semantics follow the industry-standard contract,
e.g. DuckDB ASOF JOIN / pandas merge_asof, which the unit tests use as
oracles).

Both are expressed as compositions of existing DataFrame ops so
Catalyst still owns the physical strategy:

* :func:`asof_join` — the union + keyed-window trick: tag both sides,
  union, one window per key ordered by time carrying the last right
  payload forward.  ONE shuffle on the join key, zero range fan-out,
  never a cross/theta join — O((|L|+|R|) log batch) per key at any
  scale.  A naive ``l.ts >= r.ts`` theta-join is O(|L|x|R|) per key
  and is exactly what this operator exists to avoid.
* :class:`RangeJoinMapper` — interval containment via bucketing: bin
  the range dimension, explode intervals into the buckets they cover,
  equi-join on the bucket id, then verify the exact predicate.  Turns
  an (unoptimized-in-Spark) inequality join into a shuffled hash
  equi-join whose fan-out is interval_span/bucket_width per row.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..core.mapper import SparkMapper


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_fields: Optional[Sequence[str]] = None,
    tolerance: Optional[Column] = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row
    with ``right.on <= left.on`` within the same ``by`` key (backward
    as-of join, the merge_asof/ASOF-JOIN default direction).

    ``right_fields`` selects the right payload columns (default: all
    non-key, non-time columns), each emitted as ``<name><suffix>``
    plus ``<on><suffix>`` (the matched right timestamp — null when no
    earlier right row exists).  ``tolerance`` (an interval Column,
    e.g. ``F.expr("INTERVAL 1 HOUR")``) nulls out matches older than
    ``left.on - tolerance``.

    Plan shape: union both sides -> window(partitionBy=by,
    orderBy=(on, side)) with ``last(payload, ignoreNulls=True)`` over
    the preceding frame -> keep left rows.  One exchange on ``by``,
    one in-partition sort, no join node at all.  Right rows sort
    BEFORE left rows at an equal timestamp, so ties match (<=, not <).

    ``by`` must be non-empty: a keyless as-of is a single global merge
    (one partition, no parallelism) — pre-bucket the time axis and use
    a synthetic key if that is genuinely wanted.  ``on`` must be
    orderable (numeric/timestamp).
    """
    if not by:
        raise ValueError(
            "asof_join requires a non-empty `by`: a keyless as-of is a "
            "single-partition global merge; bucket the time axis into a "
            "synthetic key if that is intended"
        )
    if right_fields is None:
        right_fields = [
            c for c in right.columns if c not in (*by, on)
        ]
    missing = [c for c in (*by, on) if c not in right.columns]
    if missing:
        raise ValueError(f"right side lacks join columns {missing}")

    # the whole right row is carried as ONE nullable struct: carrying
    # each payload column independently (last(col, ignorenulls) per
    # column) would let a genuinely-NULL payload value in the matched
    # row fall through to a STALE value from an older right row,
    # producing rows mixing columns of different right rows
    r_struct = F.struct(
        F.col(on).alias("__t__"),
        *[F.col(c).alias(c) for c in right_fields],
    )
    # null join keys never match (DuckDB ASOF / pandas merge_asof both
    # ignore them): a null-`on` right row would otherwise sort FIRST
    # (nulls-first asc) carrying a non-null __r__ struct, and every left
    # row with no real earlier match would surface its payload.  Left
    # rows with null `on` need no filter: with null right rows gone they
    # sort ahead of all right rows and see only null __r__, so they come
    # out unmatched — exactly the oracle behavior.
    right = right.filter(F.col(on).isNotNull())
    r = right.select(
        *by,
        F.col(on).alias("__t__"),
        F.lit(0).alias("__side__"),  # right sorts first on ts ties
        r_struct.alias("__r__"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}__")
            for c in left.columns
        ],
    )
    l = left.select(
        *by,
        F.col(on).alias("__t__"),
        F.lit(1).alias("__side__"),
        F.lit(None).cast(
            r.schema["__r__"].dataType
        ).alias("__r__"),
        *[F.col(c).alias(f"__l_{c}__") for c in left.columns],
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("__t__", "__side__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).select(
        "*",
        F.last("__r__", ignorenulls=True).over(w).alias("__m__"),
    )
    out = carried.filter(F.col("__side__") == 1)
    within = F.lit(True)
    if tolerance is not None:
        within = F.col("__m__.__t__") >= (F.col("__t__") - tolerance)
    matched = F.when(within, F.col("__m__"))
    result = out.select(
        *[
            F.col(f"__l_{c}__").alias(c)
            for c in left.columns
        ],
        matched["__t__"].alias(f"{on}{suffix}"),
        *[
            matched[c].alias(f"{c}{suffix}")
            for c in right_fields
        ],
    )
    return result


class AsofJoinMapper(SparkMapper):
    """Mapper wrapper over :func:`asof_join` (right side fixed at
    construction) so as-of enrichment composes in a Pipeline."""

    def __init__(
        self,
        right: DataFrame,
        on: str,
        by: Sequence[str],
        right_fields: Optional[Sequence[str]] = None,
        tolerance: Optional[Column] = None,
        suffix: str = "_asof",
    ) -> None:
        self.right = right
        self.on = on
        self.by = list(by)
        self.right_fields = (
            list(right_fields) if right_fields is not None else None
        )
        self.tolerance = tolerance
        self.suffix = suffix
        super().__init__(input_fields=[on, *by])

    def apply(self, df: DataFrame) -> DataFrame:
        return asof_join(
            df,
            self.right,
            on=self.on,
            by=self.by,
            right_fields=self.right_fields,
            tolerance=self.tolerance,
            suffix=self.suffix,
        )


class RangeJoinMapper(SparkMapper):
    """Join points to the intervals containing them
    (``r.start <= l.point < r.end``, optional equal ``by`` keys)
    without a theta join: intervals explode into the fixed-width
    buckets they overlap, points map to their single bucket, the two
    sides equi-join on (bucket, *by), and the exact containment
    predicate filters survivors.

    ``bucket_width`` trades fan-out for bucket occupancy: explode
    factor is ``ceil(span / bucket_width) + 1`` per interval, so pick
    a width near the typical interval span.  An interval spanning more
    than ``max_buckets_per_interval`` buckets fails fast with a clear
    error instead of silently exploding (an open-ended 1e9-wide
    interval at width 10 would otherwise materialize 10^8 rows and OOM
    the executors) — widen ``bucket_width`` or clamp the interval.
    All candidate generation is a shuffled hash equi-join — never
    CartesianProduct / BroadcastNestedLoopJoin (plan-asserted in
    tests) — which is what makes it survive 100x: cost follows
    matches, not |L| x |R|.
    """

    def __init__(
        self,
        intervals: DataFrame,
        point_field: str,
        start_field: str = "start",
        end_field: str = "end",
        by: Sequence[str] = (),
        bucket_width: float = 1.0,
        how: str = "inner",
        max_buckets_per_interval: int = 10_000,
    ) -> None:
        if how not in ("inner", "left"):
            raise ValueError(f"unknown how {how}")
        if bucket_width <= 0:
            raise ValueError("bucket_width must be positive")
        self.max_buckets_per_interval = max_buckets_per_interval
        self.intervals = intervals
        self.point_field = point_field
        self.start_field = start_field
        self.end_field = end_field
        self.by = list(by)
        self.bucket_width = bucket_width
        self.how = how
        super().__init__(input_fields=[point_field, *by])

    def apply(self, df: DataFrame) -> DataFrame:
        w = F.lit(self.bucket_width)
        start_b = F.floor(F.col(self.start_field) / w)
        end_b = F.floor(F.col(self.end_field) / w)
        cap = self.max_buckets_per_interval
        guard = F.assert_true(
            end_b - start_b < F.lit(cap),
            F.concat(
                F.lit(
                    "RangeJoinMapper: interval spans more than "
                    f"{cap} buckets at bucket_width="
                    f"{self.bucket_width} (start="
                ),
                F.col(self.start_field).cast("string"),
                F.lit(", end="),
                F.col(self.end_field).cast("string"),
                F.lit(
                    "); widen bucket_width or clamp the interval "
                    "(max_buckets_per_interval raises this cap)"
                ),
            ),
        )
        ivals = self.intervals.withColumn(
            "__bucket__",
            F.explode(
                F.when(guard.isNull(), F.sequence(start_b, end_b))
            ),
        )
        points = df.withColumn(
            "__bucket__", F.floor(F.col(self.point_field) / w)
        )
        # the exact containment predicate goes INTO the join condition
        # (still a hash equi-join on the bucket key, with the range
        # check as the join's residual filter): one candidate join
        # serves both modes — left-outer then yields exactly one
        # null-extended row for points no interval contains, instead
        # of re-running the whole exploded join as an anti-join
        cond = (
            (points["__bucket__"] == ivals["__bucket__"])
            & (ivals[self.start_field] <= points[self.point_field])
            & (points[self.point_field] < ivals[self.end_field])
        )
        for c in self.by:
            cond = cond & (points[c] == ivals[c])
        how = "inner" if self.how == "inner" else "left_outer"
        joined = points.join(ivals, cond, how)
        keep = [points[c] for c in df.columns] + [
            ivals[c]
            for c in self.intervals.columns
            if c not in (*self.by,)
        ]
        return joined.select(*keep)


__all__ = ["asof_join", "AsofJoinMapper", "RangeJoinMapper"]
