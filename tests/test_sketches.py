"""KMV distinct sketches: exactness when unsaturated, error bounds
when saturated, merge algebra, DuckDB hash parity, and the estimator's
integer arithmetic."""

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from smashed_spark.functions.sketches import (
    KMVSketch,
    distinct_estimate,
    kmv_sketch,
)


def _vals(spark, values):
    return spark.createDataFrame([(v,) for v in values], "v: string")


def test_unsaturated_is_exact(spark):
    df = _vals(spark, [f"x{i % 7}" for i in range(100)])
    sk = kmv_sketch(df, "v", k=64)
    assert not sk.saturated
    assert sk.estimate() == 7


def test_saturated_estimate_within_error_bound(spark):
    n = 5000
    df = _vals(spark, [f"val-{i}" for i in range(n)])
    for k in (64, 256):
        sk = kmv_sketch(df, "v", k=k)
        assert sk.saturated and len(sk.hashes) == k
        rel_err = abs(sk.estimate() - n) / n
        # RSE ~ 1/sqrt(k-2); allow 4 sigma
        assert rel_err < 4 / math.sqrt(k - 2), (k, sk.estimate())


def test_duplicates_do_not_inflate(spark):
    base = [f"v{i}" for i in range(1000)]
    df = _vals(spark, base * 5)  # every value 5x
    sk = kmv_sketch(df, "v", k=128)
    sk2 = kmv_sketch(_vals(spark, base), "v", k=128)
    assert sk.hashes == sk2.hashes  # multiplicity-invariant by design


def test_pathological_duplication_of_smallest_hashes(spark):
    """>2k copies of few distinct values forces the exact-distinct
    fallback branch; the sketch must stay correct (unsaturated ->
    exact)."""
    df = _vals(spark, [f"d{i % 5}" for i in range(3000)])
    sk = kmv_sketch(df, "v", k=16)
    assert sk.estimate() == 5


def test_nulls_are_ignored(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,)], "v: string"
    )
    assert kmv_sketch(df, "v", k=8).estimate() == 2


def test_merge_equals_sketch_of_union(spark):
    a = [f"a{i}" for i in range(2000)]
    b = [f"b{i}" for i in range(1500)] + a[:500]
    ska = kmv_sketch(_vals(spark, a), "v", k=64)
    skb = kmv_sketch(_vals(spark, b), "v", k=64)
    sku = kmv_sketch(_vals(spark, a + b), "v", k=64)
    merged = ska.merge(skb)
    assert merged.hashes == sku.hashes  # lossless merge at fixed k
    with pytest.raises(ValueError):
        ska.merge(KMVSketch(32, []))


def test_hash_parity_with_duckdb(spark):
    vals = [f"doc-{i}" for i in range(50)]
    sk = kmv_sketch(_vals(spark, vals), "v", k=50)
    con = duckdb.connect()
    got = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT ('0x' || substr(md5(v), 1, 15))::BIGINT AS h "
            "FROM (SELECT unnest(?) AS v) ORDER BY h",
            [vals],
        ).fetchall()
    ]
    assert sk.hashes == got


def test_estimator_integer_arithmetic():
    sk = KMVSketch(4, [10, 20, 30, 1 << 58])
    # ((4-1) * 2^60) // 2^58 == 12
    assert sk.estimate() == 12


def test_distinct_estimate_gate_surface(spark, sf_dir):
    from smashed_spark.plans.registry import load

    ev = load(spark, sf_dir, "events")
    out = distinct_estimate(ev, ["user_id", "event_type"], k=64)
    rows = {r.column: r for r in out.collect()}
    exact_users = ev.select("user_id").distinct().count()
    exact_types = ev.select("event_type").distinct().count()
    # event_type is tiny -> unsaturated -> exact
    assert rows["event_type"].est_distinct == exact_types
    assert rows["event_type"].n_hashes == exact_types
    # user_id: within 4/sqrt(k-2)
    err = abs(rows["user_id"].est_distinct - exact_users) / exact_users
    assert err < 4 / math.sqrt(62), rows["user_id"]


def test_k_validation(spark):
    with pytest.raises(ValueError):
        kmv_sketch(_vals(spark, ["a"]), "v", k=2)


def test_multi_column_matches_per_column_bitwise(spark):
    """kmv_sketch_multi is the single-pass path behind
    distinct_estimate: same hash convention + same candidate rule as
    kmv_sketch, so the sketches must be bit-identical per column —
    including a pathological column that trips the duplicate
    fallback."""
    from smashed_spark.functions.sketches import kmv_sketch_multi

    rows = [
        (f"u{i % 700}", f"t{i % 3}", f"w{i}") for i in range(2100)
    ]
    df = spark.createDataFrame(rows, "a: string, b: string, c: string")
    multi = kmv_sketch_multi(df, ["a", "b", "c"], k=64)
    for col in ("a", "b", "c"):
        single = kmv_sketch(df, col, k=64)
        assert multi[col].hashes == single.hashes, col
        assert multi[col].estimate() == single.estimate()


def test_multi_column_batched_fallback_two_pathological(spark):
    """r16: when SEVERAL columns trip the exact-distinct fallback they
    share ONE batched job instead of a full scan each — the batch must
    stay bit-identical to the per-column kmv_sketch path for every
    column, pathological or not."""
    from smashed_spark.functions.sketches import kmv_sketch_multi

    rows = [
        (f"x{i % 4}", f"y{i % 7}", f"w{i}") for i in range(2100)
    ]
    df = spark.createDataFrame(rows, "a: string, b: string, c: string")
    # a (4 distinct) and b (7 distinct) both saturate 2k candidate
    # rows with duplicates -> both take the batched fallback; c stays
    # on the sketch path
    multi = kmv_sketch_multi(df, ["a", "b", "c"], k=64)
    assert multi["a"].estimate() == 4
    assert multi["b"].estimate() == 7
    for col in ("a", "b", "c"):
        single = kmv_sketch(df, col, k=64)
        assert multi[col].hashes == single.hashes, col


def test_multi_column_single_pass_plan(spark):
    """The scale contract: ONE scan feeding a WindowGroupLimit-pushed
    per-column top-k — the partial limit must sit below the exchange
    (map-side), and the plan must contain exactly one exchange (the
    cidx repartition for the final per-group limit)."""
    from pyspark.sql.window import Window

    from smashed_spark.functions.hashing import portable_hash60

    df = spark.createDataFrame(
        [(f"u{i}", f"t{i % 5}") for i in range(100)], "a: string, b: string"
    )
    k = 16
    structs = [
        F.when(
            F.col(c).isNotNull(),
            F.struct(
                F.lit(i).alias("cidx"),
                portable_hash60(F.col(c).cast("string")).alias("h"),
            ),
        )
        for i, c in enumerate(["a", "b"])
    ]
    pairs = df.select(
        F.explode(F.array_compact(F.array(*structs))).alias("p")
    ).select(F.col("p.cidx").alias("cidx"), F.col("p.h").alias("h"))
    w = Window.partitionBy("cidx").orderBy("h")
    cand = pairs.withColumn("__rn__", F.row_number().over(w)).where(
        F.col("__rn__") <= 2 * k
    )
    plan = cand._sc._jvm.PythonSQLUtils.explainString(
        cand._jdf.queryExecution(), "formatted"
    )
    # partial (map-side) + final group limit around exactly one
    # exchange: two WindowGroupLimit nodes, one below the shuffle
    # ("Node (n)" counts tree occurrences only; details print "(n) Node")
    assert plan.count("WindowGroupLimit (") == 2, plan
    assert plan.count("Exchange (") == 1, plan
