"""One-pass corpus profiler (functions/profile.py)."""

import math

import pytest
from pyspark.sql import functions as F

from smashed_spark.functions.profile import profile_corpus


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _sample(spark):
    rows = [
        (1, "alpha", 10.0, True),
        (2, "beta", 20.0, False),
        (3, None, 30.0, None),
        (4, "alpha", None, True),
        (5, "gamma", float("nan"), True),
    ]
    return spark.createDataFrame(
        rows, "id long, name string, score double, flag boolean"
    )


def test_profile_values_match_python(spark):
    prof = {
        r["column"]: r.asDict()
        for r in profile_corpus(_sample(spark), kmv_k=16).collect()
    }
    assert set(prof) == {"id", "name", "score", "flag"}

    i = prof["id"]
    assert (i["n_rows"], i["n_nulls"], i["null_frac"]) == (5, 0, 0.0)
    assert (i["min_value"], i["max_value"]) == ("1", "5")
    assert i["mean"] == pytest.approx(3.0)
    assert i["est_distinct"] == 5.0  # unsaturated KMV: exact
    assert i["avg_len"] is None

    n = prof["name"]
    assert n["n_nulls"] == 1
    assert (n["min_value"], n["max_value"]) == ("alpha", "gamma")
    assert n["avg_len"] == pytest.approx((5 + 4 + 5 + 5) / 4)
    assert n["est_distinct"] == 3.0
    assert n["mean"] is None and n["quantiles"] is None

    s = prof["score"]
    # NULL and NaN both excluded from moments; count(col) counts NaN
    # as present, so n_nulls reflects true NULLs only
    assert s["n_nulls"] == 1
    assert s["mean"] == pytest.approx(20.0)
    assert s["quantiles"] is not None
    assert all(not math.isnan(q) for q in s["quantiles"])
    # NaN must not poison min/max either (review fix): the true max is
    # 30.0, not the NaN Spark orders above every double
    assert (s["min_value"], s["max_value"]) == ("10.0", "30.0")

    f = prof["flag"]
    assert (f["min_value"], f["max_value"]) == ("false", "true")
    assert f["est_distinct"] is None  # booleans: skip the sketch


def test_profile_complex_types_counts_only(spark):
    df = spark.createDataFrame(
        [(1, [1, 2], {"a": 1}), (2, None, None)],
        "id long, arr array<int>, m map<string,int>",
    )
    prof = {
        r["column"]: r.asDict() for r in profile_corpus(df).collect()
    }
    assert prof["arr"]["n_nulls"] == 1
    assert prof["arr"]["min_value"] is None
    assert prof["m"]["est_distinct"] is None


def test_profile_validation_and_empty(spark):
    df = _sample(spark)
    with pytest.raises(ValueError, match="columns not in"):
        profile_corpus(df, columns=["nope"])
    with pytest.raises(ValueError, match="quantiles"):
        profile_corpus(df, quantiles=(1.5,))
    empty = df.filter("id < 0")
    prof = {r["column"]: r.asDict() for r in profile_corpus(empty).collect()}
    assert prof["id"]["n_rows"] == 0
    assert prof["id"]["null_frac"] is None


def test_profile_agg_is_single_exchange(spark):
    # the stat pass: one global aggregate — partial rows per task,
    # ONE exchange, regardless of how many columns are profiled
    df = _sample(spark)
    aggs = df.agg(
        F.count(F.lit(1)), F.avg("score"),
        F.percentile_approx("score", F.array(F.lit(0.5)), F.lit(100)),
    )
    plan = _explain(aggs)
    assert plan.count("Exchange (") == 1, plan


def test_profile_on_documents(spark, sf_dir):
    from smashed_spark.plans.registry import load

    prof = profile_corpus(
        load(spark, sf_dir, "documents"), kmv_k=64
    )
    rows = {r["column"]: r.asDict() for r in prof.collect()}
    assert rows["doc_id"]["n_nulls"] == 0
    assert rows["lang"]["est_distinct"] == 5.0
    assert rows["n_chars"]["quantiles"] is not None
