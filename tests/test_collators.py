"""Collator goldens (reference: tests/test_collators.py semantics —
ragged pad-to-longest, fixed length, multiple-of, left pad)."""

import pytest

from smashed_spark.functions.wordpiece import tiny_bert_tokenizer
from smashed_spark.operators.collators import (
    FromTokenizerListCollatorMapper,
    ListCollatorMapper,
)

SCHEMA = "input_ids: array<array<bigint>>, aaa: array<array<bigint>>"


def _df(spark):
    return spark.createDataFrame(
        [([[1, 2, 3], [4, 5]], [[3, 3, 3], [4, 4]])], SCHEMA
    )


def test_pad_to_longest(spark):
    out = (
        ListCollatorMapper(fields_pad_ids={"input_ids": 0, "aaa": -1})
        .map(_df(spark))
        .collect()[0]
    )
    assert out.input_ids == [[1, 2, 3], [4, 5, 0]]
    assert out.aaa == [[3, 3, 3], [4, 4, -1]]


def test_pad_to_length(spark):
    out = (
        ListCollatorMapper(pad_to_length=5, unk_fields_pad_id=0)
        .map(_df(spark))
        .collect()[0]
    )
    assert out.input_ids == [[1, 2, 3, 0, 0], [4, 5, 0, 0, 0]]


def test_pad_to_length_too_short_raises(spark):
    with pytest.raises(Exception):
        ListCollatorMapper(pad_to_length=2, unk_fields_pad_id=0).map(
            _df(spark)
        ).collect()


def test_pad_to_multiple_of(spark):
    out = (
        ListCollatorMapper(pad_to_multiple_of=4, unk_fields_pad_id=0)
        .map(_df(spark))
        .collect()[0]
    )
    assert out.input_ids == [[1, 2, 3, 0], [4, 5, 0, 0]]


def test_left_pad(spark):
    out = (
        ListCollatorMapper(
            unk_fields_pad_id=0, left_pad_fields=["input_ids"]
        )
        .map(_df(spark))
        .collect()[0]
    )
    assert out.input_ids == [[1, 2, 3], [0, 4, 5]]
    assert out.aaa == [[3, 3, 3], [4, 4, 0]]


def test_missing_pad_id_raises(spark):
    with pytest.raises(ValueError):
        ListCollatorMapper(fields_pad_ids={"input_ids": 0}).map(
            _df(spark)
        ).collect()


def test_depth3(spark):
    df = spark.createDataFrame(
        [([[[1, 2, 3], [4, 5]], [[6, 7], [8], [9]]],)],
        "x: array<array<array<bigint>>>",
    )
    out = ListCollatorMapper(unk_fields_pad_id=0).map(df).collect()[0]
    # reference collators.py:380-421 walkthrough golden
    assert out.x == [
        [[1, 2, 3], [4, 5, 0], [0, 0, 0]],
        [[6, 7, 0], [8, 0, 0], [9, 0, 0]],
    ]


def test_from_tokenizer(spark):
    tok = tiny_bert_tokenizer()  # pad_token_id = 0
    df = spark.createDataFrame(
        [([[1, 2, 3], [4, 5]], [[1, 1, 1], [1, 1]])],
        "input_ids: array<array<bigint>>, attention_mask: array<array<bigint>>",
    )
    out = FromTokenizerListCollatorMapper(tok).map(df).collect()[0]
    assert out.input_ids == [[1, 2, 3], [4, 5, 0]]
    assert out.attention_mask == [[1, 1, 1], [1, 1, 0]]


def test_batch_collate_reference_golden(spark):
    # reference tests/test_collators.py:23-61 exact padded batches
    from smashed_spark.operators.batchers import FixedBatchSizeMapper

    rows = [
        (0, [1, 2, 3], [11, 12]),
        (1, [4, 5], [13]),
        (2, [6, 7, 8, 9, 10], [14]),
        (3, [15], [15, 16, 17, 18, 19, 20]),
        (4, [21, 22], [23, 24, 25]),
    ]
    df = spark.createDataFrame(
        rows, "i: bigint, a: array<bigint>, b: array<bigint>"
    )
    pipe = FixedBatchSizeMapper(
        3, order_by=["i"], contiguous_key=True
    ) >> ListCollatorMapper(fields_pad_ids={"a": -1, "b": -2, "i": 0})
    out = {tuple(r.i): r for r in pipe.map(df).collect()}
    first, second = out[(0, 1, 2)], out[(3, 4)]
    assert first.a == [[1, 2, 3, -1, -1], [4, 5, -1, -1, -1], [6, 7, 8, 9, 10]]
    assert first.b == [[11, 12], [13, -2], [14, -2]]
    assert second.a == [[15, -1], [21, 22]]
    assert second.b == [[15, 16, 17, 18, 19, 20], [23, 24, 25, -2, -2, -2]]


def test_nested_collate_reference_golden(spark):
    # reference tests/test_collators.py:63-80: 3-deep rectangularization
    from smashed_spark.operators.batchers import FixedBatchSizeMapper

    rows = [
        (0, [[1.0, 1.1], [2.0], [3.0, 3.1, 3.2, 3.3]], [11, 12]),
        (1, [[4.0, 4.1, 4.2, 4.3, 4.4], [5.0, 5.1]], [13]),
    ]
    df = spark.createDataFrame(
        rows, "i: bigint, a: array<array<double>>, b: array<bigint>"
    )
    pipe = FixedBatchSizeMapper(
        2, order_by=["i"], contiguous_key=True
    ) >> ListCollatorMapper(fields_pad_ids={"a": -1, "b": -2, "i": 0})
    out = pipe.map(df).collect()[0]
    assert len(out.a) == 2
    for seq in out.a:
        assert len(seq) == 3
        for inner in seq:
            assert len(inner) == 5
