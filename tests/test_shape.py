"""Shape mappers — goldens ported from reference
tests/test_shape_mappers.py and tests/test_unpacking_mapper.py."""

import pytest

from smashed_spark.operators.shape import (
    FlattenMapper,
    SingleSequenceStriderMapper,
    SingleSequenceStriderMapperWithLocations,
    UnpackingMapper,
)


def test_flatten(spark):
    df = spark.createDataFrame(
        [([[1, 2, 3, 4], [5, 6, 7, 8]],), ([[9, 10, 11, 12], [13, 14, 15, 16]],)],
        "input_ids: array<array<bigint>>",
    )
    out = FlattenMapper("input_ids").map(df).collect()
    got = sorted(r.input_ids for r in out)
    assert got == [[1, 2, 3, 4, 5, 6, 7, 8], [9, 10, 11, 12, 13, 14, 15, 16]]


def test_flatten_three_deep(spark):
    df = spark.createDataFrame(
        [([[[1], [2]], [[3]]],)], "x: array<array<array<bigint>>>"
    )
    out = FlattenMapper("x").map(df).collect()
    assert out[0].x == [1, 2, 3]


def test_unpack_single(spark):
    df = spark.createDataFrame(
        [([0, 1, 2, 3],), ([4, 5],)], "a: array<bigint>"
    )
    out = UnpackingMapper().map(df).collect()
    assert sorted(r.a for r in out) == [0, 1, 2, 3, 4, 5]


def test_unpack_multiple(spark):
    df = spark.createDataFrame(
        [([0.1, 1.1, 2.1, 3.1], [0.2, 1.2, 2.2, 3.2]), ([4.1, 5.1], [4.2, 5.2])],
        "a: array<double>, b: array<double>",
    )
    out = UnpackingMapper().map(df).collect()
    got = sorted((r.a, r.b) for r in out)
    assert got == [(float(f"{i}.1"), float(f"{i}.2")) for i in range(6)]


def test_unpack_drop_and_repeat(spark):
    df = spark.createDataFrame(
        [([0, 1, 2, 3], "hello"), ([4, 5], "hello")],
        "a: array<bigint>, b: string",
    )
    dropped = UnpackingMapper(
        fields_to_unpack=["a"], ignored_behavior="drop"
    ).map(df)
    assert dropped.columns == ["a"]
    assert sorted(r.a for r in dropped.collect()) == [0, 1, 2, 3, 4, 5]

    repeated = UnpackingMapper(
        fields_to_unpack=["a"], ignored_behavior="repeat"
    ).map(df)
    rows = repeated.collect()
    assert len(rows) == 6
    assert all(r.b == "hello" for r in rows)


def test_unpack_validation():
    with pytest.raises(ValueError):
        UnpackingMapper(fields_to_unpack=["a"], fields_to_ignore=["b"])
    with pytest.raises(ValueError):
        UnpackingMapper(fields_to_unpack=["a"])  # missing behavior


def test_strider_overlapping(spark):
    df = spark.createDataFrame(
        [([1, 2, 3, 4],), ([5, 6, 7, 8],)], "input_ids: array<bigint>"
    )
    out = SingleSequenceStriderMapper(
        field_to_stride="input_ids", max_length=3, stride=1
    ).map(df)
    got = sorted(r.input_ids for r in out.collect())
    assert got == [[1, 2, 3], [2, 3, 4], [5, 6, 7], [6, 7, 8]]


def test_strider_nonoverlapping(spark):
    df = spark.createDataFrame(
        [([1, 2, 3, 4],), ([5, 6, 7, 8],)], "input_ids: array<bigint>"
    )
    out = SingleSequenceStriderMapper(
        field_to_stride="input_ids", max_length=2, stride=2
    ).map(df)
    got = sorted(r.input_ids for r in out.collect())
    assert got == [[1, 2], [3, 4], [5, 6], [7, 8]]


def test_strider_keep_last(spark):
    df = spark.createDataFrame(
        [([1, 2, 3, 4],), ([5, 6, 7, 8],)], "input_ids: array<bigint>"
    )
    out = SingleSequenceStriderMapper(
        field_to_stride="input_ids", max_length=3, stride=3, keep_last=True
    ).map(df)
    got = sorted(r.input_ids for r in out.collect())
    assert got == [[1, 2, 3], [4], [5, 6, 7], [8]]


def test_strider_short_passthrough(spark):
    df = spark.createDataFrame([([1, 2],)], "input_ids: array<bigint>")
    out = SingleSequenceStriderMapper(
        field_to_stride="input_ids", max_length=5
    ).map(df).collect()
    assert len(out) == 1 and out[0].input_ids == [1, 2]


def test_strider_with_locations(spark):
    # 8-token seq, spans [[0,2]]; windows of 4: first overlaps, second not
    df = spark.createDataFrame(
        [([1, 2, 3, 4, 5, 6, 7, 8], [[0, 2]], "keepme")],
        "ids: array<bigint>, locs: array<array<bigint>>, tag: string",
    )
    out = (
        SingleSequenceStriderMapperWithLocations(
            field_to_stride="ids",
            max_length=4,
            field_with_locations="locs",
            fields_replacement_map={"tag": "REPLACED"},
        )
        .map(df)
        .collect()
    )
    assert len(out) == 2
    by_ids = {tuple(r.ids): r.tag for r in out}
    assert by_ids[(1, 2, 3, 4)] == "keepme"
    assert by_ids[(5, 6, 7, 8)] == "REPLACED"


def test_strider_with_locations_later_window(spark):
    """Regression: a span overlapping a window past index 0 must keep.
    (Spark's lateral column alias resolution once bound the overlap
    check's ref-field size() to the already-sliced window, marking all
    later windows as non-overlapping.)"""
    df = spark.createDataFrame(
        [([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12], [[5, 7]], "keepme")],
        "ids: array<bigint>, locs: array<array<bigint>>, tag: string",
    )
    out = (
        SingleSequenceStriderMapperWithLocations(
            field_to_stride="ids",
            max_length=4,
            field_with_locations="locs",
            fields_replacement_map={"tag": "REPLACED"},
        )
        .map(df)
        .collect()
    )
    by_ids = {tuple(r.ids): r.tag for r in out}
    assert by_ids[(1, 2, 3, 4)] == "REPLACED"
    assert by_ids[(5, 6, 7, 8)] == "keepme"  # span [5,7) hits window 1
    assert by_ids[(9, 10, 11, 12)] == "REPLACED"
