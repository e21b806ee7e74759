"""Type mappers (reference: src/smashed/mappers/types.py semantics)."""

import pytest

from smashed_spark.operators.types import (
    BinarizerMapper,
    CastMapper,
    LookupMapper,
    OneHotMapper,
)


def test_cast_scalar_and_nested(spark):
    df = spark.createDataFrame(
        [("3", [1.5, 2.5])], "a: string, b: array<double>"
    )
    out = CastMapper({"a": int, "b": int}).map(df).collect()[0]
    assert out.a == 3
    assert out.b == [1, 2]


def test_binarizer(spark):
    df = spark.createDataFrame([(0.2,), (0.9,)], "p: double")
    out = BinarizerMapper("p", 0.5).map(df).orderBy("p").collect()
    assert [r.p for r in out] == [0, 1]


def test_binarizer_array(spark):
    df = spark.createDataFrame([([0.2, 0.9],)], "p: array<double>")
    out = BinarizerMapper("p", 0.5).map(df).collect()[0]
    assert out.p == [0, 1]


def test_lookup(spark):
    df = spark.createDataFrame([("a",), ("b",)], "k: string")
    out = LookupMapper("k", {"a": 1, "b": 2}).map(df).orderBy("k").collect()
    assert [r.k for r in out] == [1, 2]


def test_lookup_heterogeneous_raises():
    with pytest.raises(ValueError):
        LookupMapper("k", {"a": 1, 2: 2})
    with pytest.raises(ValueError):
        LookupMapper("k", {"a": 1, "b": "x"})


def test_one_hot(spark):
    df = spark.createDataFrame([(2,)], "y: bigint")
    out = OneHotMapper(4, "y").map(df).collect()[0]
    assert out.y == [0, 0, 1, 0]
