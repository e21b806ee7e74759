"""Field mappers (reference goldens: tests semantics of
src/smashed/mappers/fields.py)."""

import pytest

from smashed_spark.operators.fields import (
    ChangeFieldsMapper,
    EnumerateFieldMapper,
    MakeFieldMapper,
    RenameFieldsMapper,
)


def test_change_fields_keep(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a: bigint, b: bigint, c: bigint")
    out = ChangeFieldsMapper(keep_fields=["a", "c"]).map(df)
    assert out.columns == ["a", "c"]


def test_change_fields_drop(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a: bigint, b: bigint, c: bigint")
    out = ChangeFieldsMapper(drop_fields=["b"]).map(df)
    assert out.columns == ["a", "c"]


def test_change_fields_xor():
    with pytest.raises(ValueError):
        ChangeFieldsMapper(keep_fields=["a"], drop_fields=["b"])
    with pytest.raises(ValueError):
        ChangeFieldsMapper()


def test_change_fields_missing_raises(spark):
    df = spark.createDataFrame([(1,)], "a: bigint")
    with pytest.raises(ValueError):
        ChangeFieldsMapper(keep_fields=["zz"]).map(df)
    # raise_on_missing=False tolerates
    out = ChangeFieldsMapper(keep_fields=["a", "zz"], raise_on_missing=False).map(df)
    assert out.columns == ["a"]


def test_rename_fields(spark):
    df = spark.createDataFrame([(1, 2)], "a: bigint, b: bigint")
    out = RenameFieldsMapper({"a": "x"}).map(df)
    assert set(out.columns) == {"x", "b"}
    out2 = RenameFieldsMapper({"a": "x"}, remove_rest=True).map(df)
    assert out2.columns == ["x"]


def test_make_field(spark):
    df = spark.createDataFrame([([1, 2, 3],)], "v: array<bigint>")
    out = MakeFieldMapper("flag", 7).map(df).collect()[0]
    assert out.flag == 7
    out = MakeFieldMapper("rep", 0, shape_like="v").map(df).collect()[0]
    assert out.rep == [0, 0, 0]


def test_enumerate_same_id(spark):
    df = spark.createDataFrame(
        [(0, "x"), (1, "y"), (2, "x"), (3, "z"), (4, "y")], "i: bigint, v: string"
    )
    out = (
        EnumerateFieldMapper("v", destination_field="e", order_by=["i"])
        .map(df)
        .orderBy("i")
        .collect()
    )
    # first-seen order: x=0, y=1, z=2
    assert [r.e for r in out] == [0, 1, 0, 2, 1]


def test_enumerate_unique(spark):
    df = spark.createDataFrame(
        [(0, "x"), (1, "x"), (2, "x")], "i: bigint, v: string"
    )
    out = (
        EnumerateFieldMapper("v", same_id_for_repeated=False, order_by=["i"])
        .map(df)
        .orderBy("i")
        .collect()
    )
    assert [r.v for r in out] == [0, 1, 2]
