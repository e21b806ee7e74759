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


def test_exact_quantiles_match_sorted_ranks(spark):
    """r12: quantile_mode='exact' returns the ceil(q*n)-th smallest
    non-NULL non-NaN value — checked against a driver-side sort,
    including ties, NULLs, NaNs, and a column with no valid values."""
    import math as _m

    rows = [
        (1.0, 5, None),
        (2.0, 5, None),
        (2.0, 1, None),
        (float("nan"), 2, None),
        (None, 2, None),
        (9.0, 7, None),
    ]
    df = spark.createDataFrame(rows, "a double, b int, c double")
    qs = (0.25, 0.5, 0.75, 0.99)
    prof = {
        r["column"]: r.asDict()
        for r in profile_corpus(
            df, quantiles=qs, quantile_mode="exact"
        ).collect()
    }

    def want(vals):
        vals = sorted(vals)
        return [vals[max(1, _m.ceil(q * len(vals))) - 1] for q in qs]

    assert prof["a"]["quantiles"] == want([1.0, 2.0, 2.0, 9.0])
    assert prof["b"]["quantiles"] == want([5.0, 5.0, 1.0, 2.0, 2.0, 7.0])
    assert prof["c"]["quantiles"] is None  # no valid values
    # non-numerics stay NULL in exact mode too
    mixed = df.withColumn("s", F.lit("x"))
    p2 = {
        r["column"]: r.asDict()
        for r in profile_corpus(
            mixed, quantiles=qs, quantile_mode="exact"
        ).collect()
    }
    assert p2["s"]["quantiles"] is None
    with pytest.raises(ValueError, match="quantile_mode"):
        profile_corpus(df, quantile_mode="median")


def test_exact_quantiles_single_exchange_plan(spark):
    """The exact tier's rank job: the count window rides the rank
    window's exchange (shared partitioning), so the slim pair stream
    exchanges exactly once."""
    from pyspark.sql.window import Window

    df = _sample(spark).select("id", "score")
    pairs = df.select(
        F.explode(
            F.array_compact(
                F.array(
                    F.when(
                        F.col("score").isNotNull()
                        & ~F.isnan(F.col("score")),
                        F.struct(
                            F.lit(0).alias("cidx"),
                            F.col("score").alias("v"),
                        ),
                    )
                )
            )
        ).alias("p")
    ).select("p.cidx", "p.v")
    ranked = pairs.select(
        "cidx",
        F.row_number()
        .over(Window.partitionBy("cidx").orderBy("v"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("cidx")).alias("n"),
    )
    plan = _explain(ranked)
    assert plan.count("Exchange (") == 1, plan


def test_exact_quantiles_match_duckdb_rank_replay(spark):
    """Cross-engine replay: DuckDB computes the same order statistics
    from the same ceil(q*n) rank expression — the gate-fold oracle's
    convention."""
    import duckdb

    vals = [float(x) for x in [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    qs = (0.25, 0.5, 0.75, 0.99)
    prof = {
        r["column"]: r.asDict()
        for r in profile_corpus(
            df, quantiles=qs, quantile_mode="exact"
        ).collect()
    }
    con = duckdb.connect()
    got = []
    for q in qs:
        got.append(
            con.execute(
                f"""
                SELECT v FROM (
                    SELECT x AS v,
                           row_number() OVER (ORDER BY x) AS rn,
                           count(*) OVER () AS n
                    FROM (SELECT unnest(?) AS x)
                ) WHERE rn = greatest(1, CAST(ceil({q} * n) AS BIGINT))
                """,
                [vals],
            ).fetchone()[0]
        )
    assert prof["x"]["quantiles"] == got
