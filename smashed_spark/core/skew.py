"""Skew mitigation utilities.

AQE's skew-join splitting handles most runtime skew automatically
(enabled in all session configs here); these helpers cover the two
cases AQE cannot re-plan:

* ``salted_groupby_agg`` — a hot grouping key whose single reducer
  becomes the straggler: pre-aggregate on (key, salt) so the hot key's
  work spreads over ``num_salts`` reducers, then merge.  Only valid for
  algebraic aggregates (sum/count/min/max), which re-merge exactly.
* ``salted_join`` — a skewed fact-side key joining a dimension too big
  to broadcast: replicate each dimension row ``num_salts`` times and
  scatter fact rows uniformly over the salt space, so one hot key's
  rows land on ``num_salts`` tasks instead of one.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt__"

_PARTIAL = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
# merge function applied to the partial results
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts add up
    "min": F.min,
    "max": F.max,
}


def salted_groupby_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    agg_map: Dict[str, Tuple[str, str]],
    num_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation: ``agg_map`` maps output name ->
    (column, one of 'sum'|'count'|'min'|'max')."""
    for _, (_, fn) in agg_map.items():
        if fn not in _PARTIAL:
            raise ValueError(
                f"unsupported aggregate '{fn}' — salting only re-merges "
                "algebraic aggregates (sum/count/min/max)"
            )
    salted = df.withColumn(
        _SALT, (F.rand(seed) * num_salts).cast("int")
    )
    partial = salted.groupBy(*group_cols, _SALT).agg(
        *[
            _PARTIAL[fn](col).alias(out)
            for out, (col, fn) in agg_map.items()
        ]
    )
    return partial.groupBy(*group_cols).agg(
        *[
            _MERGE[fn](out).alias(out)
            for out, (_, fn) in agg_map.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Skew-resistant equi-join: the dimension side is replicated
    ``num_salts`` times (cost: num_salts x |dim|), the fact side is
    scattered uniformly, and the join key becomes (key, salt)."""
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(num_salts - 1))
    ).alias(_SALT)
    dim_salted = dim.select("*", salts)
    fact_salted = fact.withColumn(
        _SALT, (F.rand(seed) * num_salts).cast("int")
    )
    return fact_salted.join(dim_salted, [on, _SALT], how).drop(_SALT)
