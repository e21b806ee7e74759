"""Skew mitigation utilities.

AQE's skew-join splitting handles most runtime skew automatically
(enabled in all session configs here); these helpers cover the two
cases AQE cannot re-plan:

* ``salted_groupby_agg`` — a hot grouping key whose single reducer
  becomes the straggler: pre-aggregate on (key, salt) so the hot key's
  work spreads over ``num_salts`` reducers, then merge.  Only valid
  for algebraic aggregates (sum/count/min/max, and avg via an exact
  sum+count decomposition), which re-merge exactly.
* ``salted_join`` — a skewed fact-side key joining a dimension too big
  to broadcast: replicate dimension rows over the salt space and
  scatter fact rows uniformly, so one hot key's rows land on
  ``num_salts`` tasks instead of one.  With ``hot=...`` (the output of
  :func:`hot_keys`) only the hot keys are salted — replication cost
  drops from ``num_salts x |dim|`` to ``|dim| + (num_salts - 1) x
  |hot dim rows|``, which is what makes salting affordable when the
  dimension itself is large.
* ``hot_keys`` — find the keys worth salting WITHOUT a full
  groupBy-count of every key (at 100 TB that full-key exchange is
  itself the bottleneck): one single-pass ``freqItems`` scan (Karp
  et al. streaming majority — a treeAggregate with at most
  ``1/support`` tracked items per partition, NO shuffle) yields a
  guaranteed SUPERSET of the keys above the support threshold, then
  one exact count over only the candidate-filtered rows confirms
  them.  Deterministic output (the candidate pass may over-include
  depending on partition order; the exact pass filters to the true
  threshold either way).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt__"

#: join types whose semantics survive dimension-side replication: the
#: fact side is preserved and every fact row sees the full dimension
#: (each key's dim rows cover every salt).  right/full outer would
#: emit UNMATCHED dimension rows once per salt replica — silently
#: multiplied wrong results — so they are rejected loudly.
_SALTABLE_JOINS = {
    "inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "semi",
    "left_anti", "leftanti", "anti", "cross",
}


def hot_keys(
    df: DataFrame,
    col: str,
    support: float = 0.001,
    exact: bool = True,
) -> List:
    """The keys appearing in at least ``support`` fraction of rows —
    the salting candidates for :func:`salted_join` /
    :func:`salted_groupby_agg`.

    Scale: pass 1 is ``df.stat.freqItems`` — one scan, no shuffle, at
    most ``1/support`` tracked items (Spark requires support >=
    1e-4, i.e. <= 10k candidates — driver-bounded by construction).
    Pass 2 confirms candidates with ONE grouped scan: every
    non-candidate key folds into a single overflow bucket, so the
    exchange carries at most ``len(candidates) + 1`` rows per
    partition (map-side combine) and the bucket sum doubles as the
    exact row total — no separate ``count()`` scan.  ``exact=False``
    skips pass 2 and returns the superset (single scan, may over-salt
    a few cold keys — harmless, just wasted replicas).  NULL keys are
    never returned (freqItems ignores them; a NULL-heavy column is a
    data-quality problem, not a salting target).

    Threshold arithmetic: a key qualifies when ``count >= support *
    total`` with a 1e-12 relative tolerance — IEEE rounding of the
    product must not drop a key sitting exactly at the promised
    fraction (0.07 * 166500 evaluates to 11655.000000000002)."""
    import math

    if not 1e-4 <= support < 1.0:
        raise ValueError(
            f"support must be in [1e-4, 1), got {support} — below "
            "1e-4 the freqItems candidate map (1/support entries per "
            "partition) stops being driver-bounded"
        )
    # freqItems guarantees a superset only of items with frequency
    # STRICTLY greater than its support argument — a key sitting
    # exactly at the promised fraction could miss the candidate set
    # and pass 2 can only confirm candidates.  Probe with a slightly
    # smaller support (clamped to Spark's 1e-4 floor) so ">= support"
    # keys are always candidates; pass 2's exact threshold then
    # decides membership.  RESIDUAL EDGE at the floor itself: when
    # support == 1e-4 exactly, the clamp makes the probe support equal
    # to the requested support (Spark refuses anything smaller), so a
    # key at exactly the 1e-4 fraction can still miss the candidate
    # map — the boundary guarantee holds for support > 1e-4 only.
    probe_support = max(support * (1.0 - 1e-6), 1e-4)
    # warn in BOTH modes: exact=False returns the (possibly
    # boundary-missing) superset AS the final answer, so it is the
    # more exposed caller, not the less
    if probe_support == support:
        import warnings

        warnings.warn(
            "hot_keys: support is at Spark's 1e-4 freqItems floor — "
            "the strictly-greater candidate probe cannot be nudged "
            "below it, so a key at EXACTLY the 1e-4 fraction may be "
            "missed. Use support > 1e-4 for the exact-boundary "
            "guarantee.",
            stacklevel=2,
        )
    cands = [
        c for c in df.stat.freqItems([col], probe_support).collect()[0][0]
        if c is not None
    ]
    if not exact or not cands:
        return sorted(cands)
    bucketed = (
        df.groupBy(
            F.when(F.col(col).isin(cands), F.col(col)).alias("__k__")
        )
        .count()
        .collect()
    )
    total = sum(r["count"] for r in bucketed)
    thresh = math.ceil(support * total * (1 - 1e-12))
    return sorted(
        r["__k__"]
        for r in bucketed
        if r["__k__"] is not None and r["count"] >= thresh
    )

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
    (column, one of 'sum'|'count'|'min'|'max'|'avg').

    ``avg`` (r9) is decomposed algebraically — per-salt partial
    (sum, count) pairs, merged then divided — so it re-merges exactly
    like the others (an average of per-salt averages would weight
    salts, not rows, and be wrong).  NULLs behave like Spark's
    ``avg``: they contribute to neither sum nor count.
    """
    for _, (_, fn) in agg_map.items():
        if fn not in _PARTIAL and fn not in ("avg", "mean"):
            raise ValueError(
                f"unsupported aggregate '{fn}' — salting only re-merges "
                "algebraic aggregates (sum/count/min/max/avg)"
            )
    salted = df.withColumn(
        _SALT, (F.rand(seed) * num_salts).cast("int")
    )
    partials, merges, finals = [], [], []
    for out, (col, fn) in agg_map.items():
        if fn in ("avg", "mean"):
            # sum/count pair; F.count(col) skips NULLs like avg does.
            # The sum buffer is DOUBLE to match Spark's Average on
            # non-decimal inputs — a native bigint sum could overflow
            # (silently wrong in non-ANSI, ARITHMETIC_OVERFLOW in
            # ANSI) where plain F.avg would not
            partials += [
                F.sum(F.col(col).cast("double")).alias(f"__{out}_s__"),
                F.count(col).alias(f"__{out}_n__"),
            ]
            merges += [
                F.sum(f"__{out}_s__").alias(f"__{out}_s__"),
                F.sum(f"__{out}_n__").alias(f"__{out}_n__"),
            ]
            finals.append(
                (F.col(f"__{out}_s__") / F.col(f"__{out}_n__")).alias(
                    out
                )
            )
        else:
            partials.append(_PARTIAL[fn](col).alias(out))
            merges.append(_MERGE[fn](out).alias(out))
            finals.append(F.col(out))
    partial = salted.groupBy(*group_cols, _SALT).agg(*partials)
    merged = partial.groupBy(*group_cols).agg(*merges)
    return merged.select(*group_cols, *finals)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
    hot: Optional[Sequence] = None,
) -> DataFrame:
    """Skew-resistant equi-join: dimension rows are replicated over
    the salt space, fact rows scattered uniformly, and the join key
    becomes (key, salt).

    ``hot`` (e.g. the output of :func:`hot_keys`) switches to
    TARGETED salting: only rows whose key is in ``hot`` are
    salted/replicated — cold fact rows take salt 0 and cold dim rows
    exist only at salt 0, so replication cost is ``|dim| +
    (num_salts - 1) x |hot dim rows|`` instead of ``num_salts x
    |dim|``.  An empty ``hot`` list degenerates to the plain join
    shape (everything at salt 0).

    Join-type guard (r9): only fact-preserving types are accepted —
    a right/full outer join would emit every UNMATCHED dimension row
    once per salt replica, silently multiplying results.
    """
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _SALTABLE_JOINS
    }:
        raise ValueError(
            f"salted_join: how={how!r} is not fact-preserving — an "
            "unmatched dimension row would be emitted once per salt "
            "replica (num_salts x wrong results). Use inner/left/"
            "semi/anti, or salt the other side by swapping the "
            "arguments."
        )
    if hot is None:
        salts = F.explode(
            F.sequence(F.lit(0), F.lit(num_salts - 1))
        ).alias(_SALT)
        dim_salted = dim.select("*", salts)
        fact_salted = fact.withColumn(
            _SALT, (F.rand(seed) * num_salts).cast("int")
        )
    else:
        hot = list(hot)
        is_hot = F.col(on).isin(hot) if hot else F.lit(False)
        dim_salted = dim.select(
            "*",
            F.explode(
                F.when(
                    is_hot,
                    F.sequence(F.lit(0), F.lit(num_salts - 1)),
                ).otherwise(F.array(F.lit(0)))
            ).alias(_SALT),
        )
        fact_salted = fact.withColumn(
            _SALT,
            F.when(
                is_hot, (F.rand(seed) * num_salts).cast("int")
            ).otherwise(F.lit(0)),
        )
    return fact_salted.join(dim_salted, [on, _SALT], how).drop(_SALT)


def _check_cms_support(width: int, support: float) -> None:
    import math

    if math.e / width >= support / 2:
        raise ValueError(
            f"hot_keys_cms: width {width} gives an overcount bound of "
            f"e/width = {math.e / width:.2e} of total mass, not "
            f"comfortably under support/2 = {support / 2:.2e} — the "
            "candidate superset would not be support-bounded; widen "
            "the sketch or raise support"
        )


def hot_keys_cms(
    df,
    col: str,
    support: float,
    sketch=None,
    depth: int = 4,
    width: int = 1 << 16,
    salt: int = 0,
    exact: bool = True,
):
    """Heavy-hitter detection with a Count-Min sketch in place of
    :func:`hot_keys`'s ``freqItems`` probe — the MERGEABLE variant a
    running ingestion pipeline needs: ``freqItems`` state cannot be
    combined across batches, while per-batch CMS fits ``merge()``
    into a running sketch (functions/cms.py), so "hot against
    EVERYTHING ingested so far" needs no history rescan.

    Two modes:

    * ``sketch=None`` (self-contained): fit a CMS over ``df[col]``,
      take the keys of ``df`` whose estimate clears ``support *
      total`` as candidates — a guaranteed SUPERSET of the truly-hot
      keys (CMS never undercounts) — then, with ``exact=True`` (the
      default), confirm with the same single bucketed scan
      :func:`hot_keys` pass 2 uses.  Same contract as ``hot_keys``,
      no 1e-4 support floor.
    * ``sketch=<running CMS>``: candidates are ``df``'s keys whose
      history-inclusive estimate clears ``support * sketch.total``.
      ``exact`` must be False — a confirm pass over ``df`` alone
      would count only the current batch's occurrences against the
      whole stream's threshold and drop genuinely hot keys, breaking
      the one-sided contract.  The result is the documented superset
      (false positives at the sketch's collision rate; no false
      negatives among keys PRESENT in ``df`` — a key hot in history
      but absent from this batch is not enumerable from a sketch).

    Geometry guard: the CMS overcount bound is ``e/width * total``;
    if that is not comfortably under the threshold (``support/2``),
    the candidate set stops being support-bounded and the call
    raises instead of silently returning a flood.
    """
    import math

    from ..functions.cms import fit_cms, with_cms_estimate

    if not 0.0 < support < 1.0:
        raise ValueError(f"support must be in (0, 1), got {support}")
    if sketch is None:
        # validate the geometry BEFORE paying for the fit
        _check_cms_support(width, support)
        sketch = fit_cms(df, col, depth=depth, width=width, salt=salt)
    else:
        if exact:
            raise ValueError(
                "hot_keys_cms: exact=True with a caller-provided "
                "running sketch would confirm batch-local counts "
                "against the whole stream's threshold and drop hot "
                "keys — pass exact=False (the estimate superset IS "
                "the contract) or fit on this frame by omitting "
                "sketch"
            )
        # the guard must judge the sketch that will actually answer —
        # the width/depth/salt PARAMETERS are fit-mode-only and a
        # narrow running sketch would otherwise sail past a check of
        # the unused default
        _check_cms_support(sketch.width, support)
    if sketch.total == 0:
        return []
    thresh = math.ceil(support * sketch.total * (1 - 1e-12))
    # estimate on the RAW key stream and filter BEFORE the distinct:
    # the exchange then carries only threshold-passing rows (map-side
    # partial dedup folds each partition to <= candidates rows) —
    # dedup-then-estimate would shuffle the entire key vocabulary,
    # the exact full-key exchange this module exists to avoid
    keyed = df.select(F.col(col).alias("__k__")).where(
        F.col("__k__").isNotNull()
    )
    cands = [
        r["__k__"]
        for r in with_cms_estimate(keyed, "__k__", sketch, out="__est__")
        .where(F.col("__est__") >= F.lit(thresh))
        .select("__k__")
        .distinct()
        .collect()
    ]
    if not exact or not cands:
        return sorted(cands)
    bucketed = (
        df.groupBy(
            F.when(F.col(col).isin(cands), F.col(col)).alias("__k__")
        )
        .count()
        .collect()
    )
    total = sum(r["count"] for r in bucketed)
    thresh = math.ceil(support * total * (1 - 1e-12))
    return sorted(
        r["__k__"]
        for r in bucketed
        if r["__k__"] is not None and r["count"] >= thresh
    )
