"""Mergeable cardinality sketches for corpus statistics at scale.

The reference has no aggregations at all (row-local mappers only; see
src/smashed/mappers/*), so this is beyond-reference surface: the
"how many distinct URLs / users / shingles does this 100 TB corpus
have" question that every curation pipeline asks before and after
dedup.

Why KMV and not HyperLogLog?  Spark ships `approx_count_distinct`
(HLL++) and it is the right default for throwaway interactive counts —
but its binary sketch is engine-private: no DuckDB parity, no
user-inspectable state.  The K-Minimum-Values sketch (Bar-Yossef et
al. 2002, "Counting distinct elements in a data stream") is fully
deterministic given the hash function: hash every value to a uniform
60-bit integer, keep the k smallest *distinct* hashes, and estimate

    D  ≈  (k - 1) * 2^60 / h_(k)        (h_(k) = k-th smallest hash)

with relative standard error ~ 1/sqrt(k-2).  Determinism buys exact
cross-engine oracles (the same md5-based hash is computable in DuckDB
— functions/hashing.py documents the convention) and reproducible
pipeline audits; mergeability buys the 100 TB shape: sketch each
shard/partition independently, union the hash sets, re-take the k
smallest — no re-scan.

Plan shape: hash (narrow) -> distinct-ish TakeOrdered.  We skip an
explicit `.distinct()` exchange: `sort_array(collect_set(...))` after
a per-partition top-k pre-filter would be one idiom, but Spark's
TakeOrderedAndProject already computes a global top-k with
per-partition partial top-k and a driver-side merge of k rows per
partition — the classic sketch-merge, executed by the engine itself.
Duplicate hashes are removed driver-side from the <= k * partitions
candidate rows (bounded, tiny).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .hashing import portable_hash60

_HASH_SPACE = 1 << 60


class KMVSketch:
    """A materialized K-Minimum-Values sketch: the sorted list of the
    k smallest distinct 60-bit hashes seen (fewer if the column has
    fewer distinct values)."""

    def __init__(self, k: int, hashes: List[int]) -> None:
        self.k = k
        self.hashes = sorted(set(hashes))[:k]

    @property
    def saturated(self) -> bool:
        return len(self.hashes) >= self.k

    def estimate(self) -> int:
        """Distinct-count estimate; exact when unsaturated (fewer than
        k distinct values exist -> we saw all of them)."""
        if not self.saturated:
            return len(self.hashes)
        kth = self.hashes[self.k - 1]
        # integer floor division: bit-reproducible in any engine with
        # big-integer arithmetic (DuckDB: HUGEINT), no float rounding
        # ambiguity at the .5 boundary
        return ((self.k - 1) * _HASH_SPACE) // kth

    def merge(self, other: "KMVSketch") -> "KMVSketch":
        """Union semantics: the sketch of A ∪ B is the k smallest of
        the merged hash sets — associative, commutative, lossless at
        fixed k.  This is the cross-corpus / cross-day rollup path."""
        if other.k != self.k:
            raise ValueError("cannot merge KMV sketches with different k")
        return KMVSketch(self.k, self.hashes + other.hashes)


def kmv_sketch(
    df: DataFrame,
    column: str,
    k: int = 256,
    hash_expr: Optional[Column] = None,
) -> KMVSketch:
    """Build a :class:`KMVSketch` of ``column``.  One job: narrow hash
    projection, engine-side global top-k (TakeOrderedAndProject), a
    bounded driver-side dedup of the candidate rows.

    ``hash_expr`` overrides the hashed expression (e.g. a concat of
    several columns) — it is hashed with the same portable md5-60
    convention.
    """
    if k < 3:
        raise ValueError("k must be >= 3 (estimator divides by k-2 terms)")
    target = hash_expr if hash_expr is not None else F.col(column)
    hashed = df.where(F.col(column).isNotNull() if hash_expr is None else target.isNotNull()).select(
        portable_hash60(target.cast("string")).alias("__h__")
    )
    # k * dup-factor candidates: take k rows per duplicate-containing
    # stream; TakeOrdered returns k rows AFTER the global merge, so
    # duplicates inside those k must be topped up.  Pull 2k and top up
    # in the (rare) pathological case below.
    rows = hashed.orderBy("__h__").limit(2 * k).collect()
    uniq = sorted({r[0] for r in rows})
    if len(uniq) < k and len(rows) == 2 * k:
        # >half of the 2k smallest rows were duplicates: fall back to
        # the exact-distinct path for the bottom of the hash space
        uniq = [
            r[0]
            for r in hashed.distinct().orderBy("__h__").limit(k).collect()
        ]
    return KMVSketch(k, uniq[:k])


def kmv_sketch_multi(
    df: DataFrame, columns: List[str], k: int = 256
) -> dict:
    """KMV sketches for N columns in ONE pass over the corpus — the
    100 TB shape for a multi-column cardinality audit (the per-column
    :func:`kmv_sketch` loop scans the input once per column).

    Plan: a narrow per-row array of ``(cidx, hash)`` structs (nulls
    compacted out) is exploded, then a per-column top-``2k`` is taken
    with ``row_number() <= 2k`` over ``Window.partitionBy(cidx)``.
    Spark's **WindowGroupLimit** optimization (plan-asserted in
    tests/test_sketches.py) inserts a partial per-group limit BELOW
    the exchange, so every map task forwards at most ``2k`` rows per
    column — the shuffle carries ``<= tasks × N × 2k`` rows no matter
    the corpus size, and the N groups (one per column) never funnel
    full column data through one reducer.  The driver then receives
    ``<= N × 2k`` candidate rows; per-column duplicate top-up falls
    back to the exact-distinct path only for pathological columns
    (same contract as :func:`kmv_sketch`).

    Returns ``{column: KMVSketch}``; bit-identical to the per-column
    :func:`kmv_sketch` results (same hash convention, same candidate
    rule) — property-tested.
    """
    from pyspark.sql.window import Window

    if k < 3:
        raise ValueError("k must be >= 3 (estimator divides by k-2 terms)")
    if not columns:
        return {}
    structs = [
        F.when(
            F.col(c).isNotNull(),
            F.struct(
                F.lit(i).alias("cidx"),
                portable_hash60(F.col(c).cast("string")).alias("h"),
            ),
        )
        for i, c in enumerate(columns)
    ]
    pairs = df.select(
        F.explode(F.array_compact(F.array(*structs))).alias("p")
    ).select(F.col("p.cidx").alias("cidx"), F.col("p.h").alias("h"))
    w = Window.partitionBy("cidx").orderBy("h")
    cand = pairs.withColumn("__rn__", F.row_number().over(w)).where(
        F.col("__rn__") <= 2 * k
    )
    by_col: dict = {i: [] for i in range(len(columns))}
    for r in cand.collect():
        by_col[r.cidx].append(r.h)
    # >half of a column's 2k smallest rows were duplicates: fall back
    # to the exact-distinct path for the bottom of that column's hash
    # space.  r16: ONE batched job for every pathological column (the
    # old per-column loop ran a separate full-scan job per column —
    # N extra corpus passes when N columns are duplicate-heavy).  The
    # `pairs` frame already holds exactly the old fallback's input
    # (null-compacted (cidx, hash)); distinct + per-column top-k over
    # it returns the identical k smallest distinct hashes per column.
    fallback = [
        i
        for i in range(len(columns))
        if len(set(by_col[i])) < k and len(by_col[i]) == 2 * k
    ]
    fb_uniq: dict = {}
    if fallback:
        fb = (
            pairs.where(F.col("cidx").isin(fallback))
            .distinct()
            .withColumn("__rn__", F.row_number().over(w))
            .where(F.col("__rn__") <= k)
        )
        for r in fb.collect():
            fb_uniq.setdefault(r.cidx, []).append(r.h)
    out = {}
    for i, c in enumerate(columns):
        if i in fb_uniq:
            uniq = sorted(fb_uniq[i])
        else:
            uniq = sorted(set(by_col[i]))
        out[c] = KMVSketch(k, uniq[:k])
    return out


def distinct_estimate(
    df: DataFrame, columns: List[str], k: int = 256
) -> DataFrame:
    """Per-column KMV distinct estimates as a small DataFrame
    ``(column, k_used, n_hashes, kth_hash, est_distinct)`` — the gate
    surface.  ``n_hashes < k`` marks the exact (unsaturated) branch.

    One Spark job for ALL columns (:func:`kmv_sketch_multi`); the
    result is O(len(columns)) rows, created via ``createDataFrame``
    (driver-side by construction, like the loaders' bounded path
    lists).
    """
    spark = df.sparkSession
    sketches = kmv_sketch_multi(df, columns, k=k)
    out = []
    for c in columns:
        sk = sketches[c]
        kth = sk.hashes[-1] if sk.hashes else None
        out.append((c, sk.k, len(sk.hashes), kth, sk.estimate()))
    return spark.createDataFrame(
        out,
        "column: string, k_used: bigint, n_hashes: bigint, "
        "kth_hash: bigint, est_distinct: bigint",
    )
