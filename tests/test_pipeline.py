"""Pipeline-algebra tests (reference: tests/test_pipeline.py:15-105)."""

from smashed_spark import Pipeline, make_pipeline
from smashed_spark.operators.debug import MockMapper
from smashed_spark.operators.fields import MakeFieldMapper


def test_rshift_composition_order(spark):
    # reference golden: stage [[0]] through +1,+2,+3 appenders -> [0,1,2,3]
    df = spark.createDataFrame([([0],)], "stage: array<bigint>")
    pipe = MockMapper(1) >> MockMapper(2) >> MockMapper(3)
    rows = pipe.map(df).collect()
    assert rows[0].stage == [0, 1, 2, 3]


def test_lshift_is_reverse(spark):
    df = spark.createDataFrame([([0],)], "stage: array<bigint>")
    pipe = MockMapper(3) << MockMapper(2) << MockMapper(1)
    rows = pipe.map(df).collect()
    assert rows[0].stage == [0, 1, 2, 3]


def test_make_pipeline_and_indexing(spark):
    m1, m2, m3 = MockMapper(1), MockMapper(2), MockMapper(3)
    pipe = make_pipeline(m1, m2, m3)
    assert len(pipe) == 3
    assert pipe[0] is m1 and pipe[2] is m3


def test_fingerprint_equality():
    assert MockMapper(1) == MockMapper(1)
    assert MockMapper(1) != MockMapper(2)
    p1 = MockMapper(1) >> MockMapper(2)
    p2 = make_pipeline(MockMapper(1), MockMapper(2))
    assert p1.fingerprint == p2.fingerprint


def test_empty_pipeline_raises(spark):
    df = spark.createDataFrame([(1,)], "a: bigint")
    try:
        Pipeline([]).map(df)
        assert False, "expected RuntimeError"
    except RuntimeError:
        pass


def test_one(spark):
    out = MockMapper(1).one(spark, a=1)
    assert out["a"] == 2


def test_remove_columns_kwarg(spark):
    # reference map(dataset, remove_columns=True): only transform
    # output survives (base/interfaces.py:217-221)
    from smashed_spark.operators.fields import MakeFieldMapper

    df = spark.createDataFrame([(1, 2)], "a: bigint, b: bigint")
    kept = MakeFieldMapper("c", 9).map(df)
    assert set(kept.columns) == {"a", "b", "c"}
    only = MakeFieldMapper("c", 9).map(df, remove_columns=True)
    assert only.columns == ["c"]
    import pytest

    from smashed_spark.operators.debug import MockMapper

    with pytest.raises(ValueError):
        MockMapper(1).map(df, remove_columns=True)  # no declared outputs
