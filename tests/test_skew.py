"""Skew utilities must produce results identical to the direct plan."""

from pyspark.sql import functions as F

from smashed_spark.core.skew import salted_groupby_agg, salted_join
from smashed_spark.plans.registry import load


def test_salted_groupby_matches_direct(spark, sf_dir):
    df = load(spark, sf_dir, "events")
    direct = df.groupBy("event_type").agg(
        F.sum("value").alias("total"),
        F.count("value").alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    salted = salted_groupby_agg(
        df,
        ["event_type"],
        {
            "total": ("value", "sum"),
            "n": ("value", "count"),
            "lo": ("value", "min"),
            "hi": ("value", "max"),
        },
    )
    d = {r.event_type: (round(r.total, 6), r.n, r.lo, r.hi) for r in direct.collect()}
    s = {r.event_type: (round(r.total, 6), r.n, r.lo, r.hi) for r in salted.collect()}
    assert d == s


def test_salted_join_matches_direct(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    direct = orders.join(customer, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, customer, "o_custkey").select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_groupby_rejects_nonalgebraic():
    import pytest

    with pytest.raises(ValueError):
        salted_groupby_agg(None, ["k"], {"a": ("v", "avg")})
