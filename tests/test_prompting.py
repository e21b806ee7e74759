"""Prompting mappers — truncation-allocation goldens ported verbatim
from reference tests/test_prompting.py:15-55."""

import pytest

from smashed_spark.operators.prompting import (
    FillEncodedPromptMapper,
    FillTextPromptMapper,
    TruncateMultipleFieldsMapper,
    TruncateMultipleNestedFieldsMapper,
)


def _lens_df(spark, lens):
    fields = "abcde"[: len(lens)]
    row = tuple(list(range(n)) for n in lens)
    schema = ", ".join(f"{f}: array<bigint>" for f in fields)
    return spark.createDataFrame([row], schema), list(fields)


def _run_truncate(spark, lens, max_len, strategy):
    df, fields = _lens_df(spark, lens)
    out = (
        TruncateMultipleFieldsMapper(
            fields_to_truncate=fields, max_length=max_len, strategy=strategy
        )
        .map(df)
        .collect()[0]
    )
    return [len(out[f]) for f in fields]


def test_uniform_goldens(spark):
    assert _run_truncate(spark, [10, 8, 6, 4, 2], 20, "uniform") == [6, 5, 4, 2, 1]
    assert _run_truncate(spark, [50, 40, 1, 1, 1], 20, "uniform") == [10, 8, 0, 0, 0]


def test_longest_goldens(spark):
    assert _run_truncate(spark, [10, 8, 6, 4, 2], 20, "longest") == [5, 4, 4, 4, 2]
    assert _run_truncate(spark, [50, 40, 1, 1, 1], 20, "longest") == [9, 7, 1, 1, 1]


def test_no_truncation_needed(spark):
    assert _run_truncate(spark, [3, 2], 10, "uniform") == [3, 2]
    assert _run_truncate(spark, [3, 2], 10, "longest") == [3, 2]


def test_preserve_fields(spark):
    df = spark.createDataFrame(
        [(list(range(10)), list(range(4)))],
        "a: array<bigint>, p: array<bigint>",
    )
    out = (
        TruncateMultipleFieldsMapper(
            fields_to_truncate=["a"],
            fields_to_preserve=["p"],
            max_length=10,
            strategy="uniform",
        )
        .map(df)
        .collect()[0]
    )
    # budget = 10 - len(p) = 6
    assert len(out.a) == 6 and out.p == list(range(4))


def test_truncate_validation():
    with pytest.raises(ValueError):
        TruncateMultipleFieldsMapper([], max_length=5)
    with pytest.raises(ValueError):
        TruncateMultipleFieldsMapper(["a"])
    with pytest.raises(ValueError):
        TruncateMultipleFieldsMapper(["a"], max_length=5, strategy="bogus")


def test_truncate_nested(spark):
    df = spark.createDataFrame(
        [([[0, 1, 2], [3, 4], [5, 6, 7]],)], "a: array<array<bigint>>"
    )
    out = (
        TruncateMultipleNestedFieldsMapper(
            fields_to_truncate=["a"], max_length=5, strategy="uniform"
        )
        .map(df)
        .collect()[0]
    )
    # flattened len 8 -> budget 5, cut left-to-right; the tail sub-list
    # stays as [] (reference shape_utils.reconstruct_from_indices keeps
    # every sub-list boundary: [[0,1,2],[3,4],[5,6,7]] @5 -> ...,[ ])
    assert out.a == [[0, 1, 2], [3, 4], []]


def test_fill_text_prompt(spark):
    df = spark.createDataFrame(
        [("cat", "mammal", "fur")], "a: string, b: string, c: string"
    )
    out = (
        FillTextPromptMapper("{a} is a {b} with {c}.", "prompt")
        .map(df)
        .collect()[0]
    )
    assert out.prompt == "cat is a mammal with fur."


class FakeTokenizer:
    """Deterministic toy tokenizer: id = index in a fixed vocab."""

    bos_token_id = 0
    eos_token_id = 1
    vocab = {"Q:": 2, "A:": 3, " ": 4}

    def encode(self, text, add_special_tokens=False):
        return [self.vocab.get(text, 99)]


def test_fill_encoded_prompt(spark):
    df = spark.createDataFrame(
        [([10, 11], [12])], "q: array<bigint>, a: array<bigint>"
    )
    out = (
        FillEncodedPromptMapper(
            "Q:{q}A:{a}", tokenizer=FakeTokenizer()
        )
        .map(df)
        .collect()[0]
    )
    # bos + enc("Q:") + q + enc("A:") + a + eos
    assert out.input_ids == [0, 2, 10, 11, 3, 12, 1]
    assert out.attention_mask == [1] * 7


def test_fill_encoded_prefix(spark):
    df = spark.createDataFrame([([10],)], "q: array<bigint>")
    out = (
        FillEncodedPromptMapper(
            "Q:{q}",
            tokenizer=FakeTokenizer(),
            output_prefix="src",
            return_token_type_ids=True,
        )
        .map(df)
        .collect()[0]
    )
    assert out.src_input_ids == [0, 2, 10, 1]
    assert out.src_attention_mask == [1] * 4
    assert out.src_token_type_ids == [0] * 4
