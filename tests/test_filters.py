"""Filter goldens (reference: tests/test_filters.py:7-15 — rows 5,4,6
filtered >= 5 keeps 5,6; list rows [5],[4],[6] == 5 keeps [5])."""

import pytest

from smashed_spark.operators.filters import FilterMapper


def test_scalar_ge(spark):
    df = spark.createDataFrame([(5,), (4,), (6,)], "a: bigint")
    out = FilterMapper("a", ">=", 5).map(df).collect()
    assert sorted(r.a for r in out) == [5, 6]


def test_list_all_semantics(spark):
    df = spark.createDataFrame([([5],), ([4],), ([6],)], "a: array<bigint>")
    out = FilterMapper("a", "==", 5).map(df).collect()
    assert [r.a for r in out] == [[5]]


def test_list_all_must_pass(spark):
    df = spark.createDataFrame([([5, 4],), ([5, 5],)], "a: array<bigint>")
    out = FilterMapper("a", "==", 5).map(df).collect()
    assert [r.a for r in out] == [[5, 5]]


def test_arithmetic_truthiness(spark):
    # a % 2 keeps odd values (nonzero result is truthy)
    df = spark.createDataFrame([(1,), (2,), (3,)], "a: bigint")
    out = FilterMapper("a", "%", 2).map(df).collect()
    assert sorted(r.a for r in out) == [1, 3]


def test_in_contains(spark):
    # `in` semantics: operator.contains(field, value) — field contains value
    df = spark.createDataFrame([("abc",), ("xyz",)], "s: string")
    out = FilterMapper("s", "in", "b").map(df).collect()
    assert [r.s for r in out] == ["abc"]


def test_invalid_operator():
    with pytest.raises(ValueError):
        FilterMapper("a", "~~", 1)
