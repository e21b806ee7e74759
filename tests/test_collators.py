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


def test_pad_batch_reference_goldens():
    """Reference tests/test_collators.py TestListCollators.test_base_collator
    / test_nested_collators / test_left_padding / test_padding_to_multiple
    goldens against the shared client-edge padding math."""
    from smashed_spark.operators.collators import pad_batch

    a = [[1, 2, 3], [4, 5], [6, 7, 8, 9, 10]]
    assert pad_batch(a, -1) == [
        [1, 2, 3, -1, -1],
        [4, 5, -1, -1, -1],
        [6, 7, 8, 9, 10],
    ]
    nested = [
        [[1.0, 1.1], [2.0], [3.0, 3.1, 3.2, 3.3]],
        [[4.0, 4.1, 4.2, 4.3, 4.4], [5.0, 5.1]],
    ]
    out = pad_batch(nested, -1)
    assert out[0] == [
        [1.0, 1.1, -1, -1, -1],
        [2.0, -1, -1, -1, -1],
        [3.0, 3.1, 3.2, 3.3, -1],
    ]
    assert out[1] == [
        [4.0, 4.1, 4.2, 4.3, 4.4],
        [5.0, 5.1, -1, -1, -1],
        [-1, -1, -1, -1, -1],
    ]
    assert pad_batch(a, -1, left=True) == [
        [-1, -1, 1, 2, 3],
        [-1, -1, -1, 4, 5],
        [6, 7, 8, 9, 10],
    ]
    # pad_to_multiple_of rounds every ragged dim up: (.,3,5) -> (.,4,8)
    m = pad_batch(nested, -1, pad_to_multiple_of=4)
    assert len(m[0]) == 4 and all(len(s) == 8 for s in m[0])
    assert len(m[1]) == 4 and all(len(s) == 8 for s in m[1])


def test_pad_batch_pad_to_length_guard():
    from smashed_spark.operators.collators import pad_batch

    with pytest.raises(ValueError, match="pad_to_length"):
        pad_batch([[1, 2, 3]], -1, pad_to_length=2)
    assert pad_batch([[1, 2]], -1, pad_to_length=4) == [[1, 2, -1, -1]]


def test_tensor_collate_goldens_with_torch():
    """Reference TestTensorCollators.test_base_collator shapes/counts;
    runs only where torch is importable (ImportError contract is pinned
    by test_tensor_collator_requires_torch)."""
    torch = pytest.importorskip("torch")
    from smashed_spark.operators.collators import TensorCollatorMapper

    coll = TensorCollatorMapper(fields_pad_ids={"a": -1, "b": -2})
    batch = {
        "a": [[1, 2, 3], [4, 5], [6, 7, 8, 9, 10]],
        "b": [[11, 12], [13], [14]],
    }
    out = coll.collate(batch)
    assert out["a"].shape == (3, 5)
    assert out["b"].shape == (3, 2)
    assert int((out["a"] == -1).sum()) == 5
    assert int((out["b"] == -2).sum()) == 2
