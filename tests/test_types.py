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


def test_lookup_recurses_into_lists(spark):
    # reference golden (tests/test_types.py:32-50)
    df = spark.createDataFrame(
        [(["apple", "pie"],), (["key lime", "pie"],), (["fudge", "pie"],), ([],)],
        "menu: array<string>",
    )
    table = {
        "apple": "fruit",
        "key lime": "fruit",
        "pie": "dessert",
        "fudge": "chocolate",
    }
    out = sorted(
        (r.menu for r in LookupMapper("menu", table).map(df).collect()),
        key=repr,
    )
    assert sorted(
        [["fruit", "dessert"], ["fruit", "dessert"], ["chocolate", "dessert"], []],
        key=repr,
    ) == out


def test_binarizer_mixed_golden(spark):
    # reference golden (tests/test_types.py:12-29)
    df = spark.createDataFrame(
        [([0.3, 0.4, 0.8], 0.9)], "a: array<double>, b: double"
    )
    pipe = BinarizerMapper("a", 0.7) >> BinarizerMapper("b", 0.7)
    out = pipe.map(df).collect()[0]
    assert out.a == [0, 0, 1]
    assert out.b == 1
