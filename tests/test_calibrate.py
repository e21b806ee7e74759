"""Per-group quality-threshold calibration (functions/calibrate.py).

Exact tier is pinned against a pure-python order-statistic replay;
the approx tier against a retained-fraction tolerance (GK sketch rank
error <= n/accuracy).  Plan spies pin the one-exchange claims.
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from smashed_spark.functions.calibrate import (
    calibrate_thresholds,
    select_top_fraction,
)


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _py_threshold(scores, retain):
    """The exact-tier definition: k-th largest, k = ceil(r*n - eps)."""
    scores = [s for s in scores if s is not None and not math.isnan(s)]
    if not scores:
        return None
    k = max(1, math.ceil(retain * len(scores) - 1e-9))
    return sorted(scores, reverse=True)[k - 1]


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, "grp string, score double")


def test_exact_matches_python_replay(spark):
    rng = random.Random(7)
    rows = [
        (f"s{rng.randrange(4)}", round(rng.random(), 3))
        for _ in range(400)
    ]
    df = _mkdf(spark, rows)
    for retain in (0.1, 0.25, 0.5, 0.9, 1.0):
        got = {
            r["grp"]: r["threshold"]
            for r in calibrate_thresholds(
                df, "score", retain, by="grp", exact=True
            ).collect()
        }
        for g in sorted({g for g, _ in rows}):
            want = _py_threshold([s for gg, s in rows if gg == g], retain)
            assert got[g] == pytest.approx(want), (g, retain)


def test_exact_ties_and_tiny_groups(spark):
    rows = (
        [("a", 1.0)] * 5          # all tied
        + [("b", 2.0)]            # singleton
        + [("c", float(i)) for i in range(1, 5)]  # 1..4
    )
    df = _mkdf(spark, rows)
    got = {
        r["grp"]: r["threshold"]
        for r in calibrate_thresholds(
            df, "score", 0.5, by="grp", exact=True
        ).collect()
    }
    # ties: the k-th largest of five 1.0s is 1.0; filter keeps all 5
    # (documented value-based over-retention)
    assert got == {"a": 1.0, "b": 2.0, "c": 3.0}
    kept = select_top_fraction(df, "score", 0.5, by="grp", exact=True)
    by_grp = {
        r["grp"]: r["cnt"]
        for r in kept.groupBy("grp").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_grp == {"a": 5, "b": 1, "c": 2}


def test_null_and_nan_scores_never_kept(spark):
    rows = [
        ("a", 3.0), ("a", 1.0), ("a", None), ("a", float("nan")),
        ("b", None), ("b", float("nan")),
    ]
    df = _mkdf(spark, rows)
    thr = {
        r["grp"]: r["threshold"]
        for r in calibrate_thresholds(
            df, "score", 0.5, by="grp", exact=True
        ).collect()
    }
    # a: n=2 non-null, k=1 -> 3.0; b: all NULL -> NULL threshold
    assert thr["a"] == 3.0
    assert thr["b"] is None
    kept = select_top_fraction(df, "score", 0.5, by="grp", exact=True)
    out = [(r["grp"], r["score"]) for r in kept.collect()]
    assert out == [("a", 3.0)]
    # flag mode: NULL/NaN rows flagged 0, not dropped
    flagged = select_top_fraction(
        df, "score", 0.5, by="grp", exact=True,
        keep_field="keep", threshold_field="thr",
    )
    assert flagged.count() == 6
    assert flagged.filter("keep = 1").count() == 1


def test_global_calibration_no_groups(spark):
    rows = [("x", float(i)) for i in range(1, 101)]
    df = _mkdf(spark, rows)
    thr = calibrate_thresholds(df, "score", 0.25, exact=True).collect()
    assert len(thr) == 1 and thr[0]["threshold"] == 76.0
    assert select_top_fraction(df, "score", 0.25, exact=True).count() == 25


def test_approx_within_rank_tolerance(spark):
    rng = random.Random(11)
    rows = [
        (f"s{rng.randrange(3)}", rng.random()) for _ in range(3000)
    ]
    df = _mkdf(spark, rows)
    retain = 0.3
    kept = select_top_fraction(
        df, "score", retain, by="grp", accuracy=10_000
    )
    tot = {
        r["grp"]: r["c"]
        for r in df.groupBy("grp").agg(F.count("*").alias("c")).collect()
    }
    got = {
        r["grp"]: r["c"]
        for r in kept.groupBy("grp").agg(F.count("*").alias("c")).collect()
    }
    for g, n in tot.items():
        tol = max(2, n // 100)  # rank error n/accuracy, generous slack
        assert abs(got.get(g, 0) - retain * n) <= tol, (g, got, n)


def test_partition_layout_invariance(spark):
    rng = random.Random(3)
    rows = [(f"s{rng.randrange(5)}", rng.random()) for _ in range(500)]
    df = _mkdf(spark, rows)
    a = calibrate_thresholds(df, "score", 0.4, by="grp", exact=True)
    b = calibrate_thresholds(
        df.repartition(7), "score", 0.4, by="grp", exact=True
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_retain_validation(spark):
    df = _mkdf(spark, [("a", 1.0)])
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="retain"):
            calibrate_thresholds(df, "score", bad, by="grp")
    with pytest.raises(ValueError, match="score_field"):
        calibrate_thresholds(df, "nope", 0.5, by="grp")
    with pytest.raises(ValueError, match="accuracy"):
        calibrate_thresholds(df, "score", 0.5, by="grp", accuracy=10)


def test_exact_tier_single_exchange(spark):
    rows = [(f"s{i % 4}", float(i)) for i in range(100)]
    df = _mkdf(spark, rows)
    plan = _explain(calibrate_thresholds(df, "score", 0.5, by="grp", exact=True))
    # rank window + count window share the grp partitioning: ONE
    # exchange moves the slim (grp, score) projection, nothing else
    assert plan.count("Exchange (") == 1, plan


def test_approx_tier_partial_aggregation(spark):
    rows = [(f"s{i % 4}", float(i)) for i in range(100)]
    df = _mkdf(spark, rows)
    plan = _explain(calibrate_thresholds(df, "score", 0.5, by="grp"))
    tree = plan.split("\n\n")[0]
    # map-side partial sketch -> one exchange of KB-sized state
    assert plan.count("Exchange (") == 1, plan
    assert "Sort" not in tree, tree  # sketches, not a sort


def test_joinback_broadcasts_thresholds(spark):
    rows = [(f"s{i % 4}", float(i)) for i in range(100)]
    df = _mkdf(spark, rows)
    out = select_top_fraction(df, "score", 0.5, by="grp", exact=True)
    tree = _explain(out).split("\n\n")[0]
    assert "BroadcastHashJoin" in tree, tree


def test_null_group_key_retains_its_rows(spark):
    """Review fix: a NULL group key is a real group to groupBy/Window,
    so the join-back must be null-SAFE — a null-unsafe join silently
    dropped the entire NULL-source partition regardless of score."""
    rows = [
        (None, 9.0), (None, 1.0),
        ("a", 5.0), ("a", 3.0),
    ]
    df = _mkdf(spark, rows)
    thr = {
        r["grp"]: r["threshold"]
        for r in calibrate_thresholds(
            df, "score", 0.5, by="grp", exact=True
        ).collect()
    }
    assert thr == {None: 9.0, "a": 5.0}
    kept = select_top_fraction(df, "score", 0.5, by="grp", exact=True)
    got = sorted(
        ((r["grp"], r["score"]) for r in kept.collect()),
        key=lambda t: (t[0] or "", t[1]),
    )
    assert got == [(None, 9.0), ("a", 5.0)]
