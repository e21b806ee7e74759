"""ValidUnicode / Padding / TruncateSingleField (reference
tests/test_tokenize_mappers.py goldens for unicode replacement)."""

import pytest

from smashed_spark.operators.tokenize import (
    PaddingMapper,
    TruncateSingleFieldMapper,
    ValidUnicodeMapper,
)


def test_valid_unicode(spark):
    # punctuation-only tokens (category Po) replaced
    df = spark.createDataFrame(
        [(["hello", "...", "world", "!!"],)], "toks: array<string>"
    )
    out = (
        ValidUnicodeMapper(["toks"], ["Po"], "[UNK]").map(df).collect()[0]
    )
    assert out.toks == ["hello", "[UNK]", "world", "[UNK]"]


def test_padding(spark):
    df = spark.createDataFrame(
        [([1, 2, 3], [4, 5])], "a: array<bigint>, b: array<bigint>"
    )
    out = PaddingMapper(5, -1).map(df).collect()[0]
    assert out.a == [1, 2, 3, -1, -1]
    assert out.b == [4, 5, -1, -1, -1]


def test_padding_subset(spark):
    df = spark.createDataFrame(
        [([1, 2, 3], [4, 5])], "a: array<bigint>, b: array<bigint>"
    )
    out = PaddingMapper(5, -1, fields_to_pad=["a"]).map(df).collect()[0]
    assert out.a == [1, 2, 3, -1, -1]
    assert out.b == [4, 5]


def test_padding_too_long_raises(spark):
    df = spark.createDataFrame([([1, 2, 3],)], "a: array<bigint>")
    with pytest.raises(Exception):
        PaddingMapper(2, 0).map(df).collect()


def test_truncate_single(spark):
    df = spark.createDataFrame(
        [([1, 2, 3, 4, 5], "abcdef")], "a: array<bigint>, s: string"
    )
    out = TruncateSingleFieldMapper({"a": 3, "s": 2}).map(df).collect()[0]
    assert out.a == [1, 2, 3]
    assert out.s == "ab"
