"""core/lint.py — the plan linter."""

import pytest
from pyspark.sql import functions as F

from smashed_spark.core.lint import assert_plan, plan_report


def test_clean_narrow_plan(spark):
    df = spark.range(100).select(
        (F.col("id") * 2).alias("x"), (F.col("id") % 7).alias("y")
    )
    report = plan_report(df)
    assert report["counts"]["exchanges"] == 0
    assert report["counts"]["python_row_evals"] == 0
    assert report["warnings"] == []
    # assert_plan passes and returns the same shape
    r2 = assert_plan(df, max_exchanges=0, warnings_free=True)
    assert r2["counts"] == report["counts"]


def test_groupby_counts_one_hash_exchange(spark):
    df = spark.range(1000).groupBy((F.col("id") % 10).alias("k")).count()
    c = plan_report(df)["counts"]
    assert c["exchanges_hash"] == 1
    assert c["exchanges"] >= 1


def test_cartesian_warns(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    df = a.crossJoin(b)
    report = plan_report(df)
    assert report["counts"]["cartesian_products"] >= 1
    assert any("cartesian" in w for w in report["warnings"])
    with pytest.raises(AssertionError, match="warnings"):
        assert_plan(df, warnings_free=True)


def test_row_python_udf_warns_arrow_does_not(spark):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf, udf

    df = spark.range(100)
    slow = df.select(udf(lambda v: v + 1, "long")("id").alias("x"))
    rep = plan_report(slow)
    assert rep["counts"]["python_row_evals"] == 1
    assert any("row-at-a-time" in w for w in rep["warnings"])

    @pandas_udf("long")
    def plus(v: pd.Series) -> pd.Series:
        return v + 1

    fast = df.select(plus("id").alias("x"))
    rep2 = plan_report(fast)
    assert rep2["counts"]["python_row_evals"] == 0
    assert rep2["counts"]["python_arrow_evals"] == 1
    assert not any("row-at-a-time" in w for w in rep2["warnings"])


def test_global_sort_warns_but_topk_does_not(spark):
    # non-monotonic key: range output is already ordered by id, so
    # Catalyst would eliminate an orderBy("id") sort entirely
    base = spark.range(1000).select((F.col("id") % 7).alias("k"))
    rep = plan_report(base.orderBy("k"))
    assert any("global sort" in w for w in rep["warnings"])
    # orderBy + limit compiles to TakeOrderedAndProject — no warning
    rep2 = plan_report(base.orderBy("k").limit(5))
    assert not any("global sort" in w for w in rep2["warnings"])


def test_pushdown_visibility(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pushed = plan_report(docs.filter(F.col("n_chars") > 100))
    assert pushed["scans"], "expected scan details"
    assert any(
        "n_chars" in s["pushed_filters"] for s in pushed["scans"]
    )
    assert not any(
        "no pushed filters" in w for w in pushed["warnings"]
    )
    # a UDF-wrapped predicate cannot push — the linter flags it
    from pyspark.sql.functions import udf

    opaque = udf(lambda v: v > 100, "boolean")
    blocked = plan_report(docs.filter(opaque(F.col("n_chars"))))
    assert any(
        s["pushed_filters"] == "" for s in blocked["scans"]
    )
    assert any("AFTER IO" in w for w in blocked["warnings"])


def test_broadcast_and_reused_exchanges_are_not_shuffles(spark):
    """max_exchanges=0 must HOLD for a broadcast-enrich plan — the
    whole point of broadcasting is that the big side never shuffles;
    BroadcastExchange/ReusedExchange must not count."""
    big = spark.range(10000).select(
        "id", (F.col("id") % 10).alias("k")
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(10)], "k bigint, name string"
    )
    joined = big.join(F.broadcast(dim), "k")
    rep = assert_plan(joined, max_exchanges=0)
    assert rep["counts"]["broadcast_exchanges"] >= 1
    assert rep["counts"]["exchanges"] == 0


def test_no_pushdown_warning_requires_a_filter_node(spark, tmp_path):
    """A filterless parquet scan must NOT warn: the scan's own
    'PushedFilters:' metadata line is not a Filter node."""
    path = str(tmp_path / "p")
    spark.createDataFrame([(1, "a")], "id bigint, s string").write.parquet(
        path
    )
    rep = plan_report(spark.read.parquet(path).select("id"))
    assert any(s["pushed_filters"] == "" for s in rep["scans"])
    assert not any("AFTER IO" in w for w in rep["warnings"])
    assert_plan(spark.read.parquet(path).select("id"), warnings_free=True)


def test_global_sort_detected_with_bracketed_sort_key(spark):
    """A sort key containing ']' (array element access) must not
    defeat the global-sort detection."""
    df = spark.createDataFrame(
        [([3, 1],), ([2, 5],)], "arr array<int>"
    ).orderBy(F.col("arr")[0])
    rep = plan_report(df)
    assert any("global sort" in w for w in rep["warnings"])


def test_assert_plan_contracts(spark):
    df = spark.range(100).groupBy((F.col("id") % 5).alias("k")).count()
    with pytest.raises(AssertionError, match="exchanges"):
        assert_plan(df, max_exchanges=0)
    with pytest.raises(AssertionError, match="forbidden"):
        assert_plan(df, forbid=("HashAggregate",))
    report = assert_plan(df, max_exchanges=2)
    assert report["counts"]["exchanges_hash"] == 1
