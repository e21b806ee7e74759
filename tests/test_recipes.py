"""Recipes: composed pipelines (reference: src/smashed/recipes/*)."""

import pytest

from smashed_spark.functions.wordpiece import tiny_bert_tokenizer
from smashed_spark.recipes.prompting import (
    CollatorRecipe,
    JinjaRecipe,
    PromptingRecipe,
)


def test_prompting_recipe_basic(spark):
    # mirrors the reference's encode->truncate->fill chain
    # (tests/test_prompting.py test_fill golden, via the recipe)
    tok = tiny_bert_tokenizer()
    recipe = PromptingRecipe(
        tokenizer=tok,
        source_template="{a} is a {b} with the help of {c}.",
        source_add_bos_token=False,
        fields_to_truncate=["a", "b"],
        max_source_length=16 + 7,  # content budget + static prompt penalty
        strategy="uniform",
    )
    df = spark.createDataFrame(
        [("many " * 30 + " hello world", "hi" + "i" * 10 + " there", "this is a test")],
        "a: string, b: string, c: string",
    )
    out = recipe.map(df).collect()[0]
    assert out.input_ids == (
        [12] * 8 + [7, 8] + [10, 13, 13] + [14, 15, 1, 16] + [6, 7, 8, 9] + [1]
    )
    assert out.attention_mask == [1] * 22
    assert sorted(out.asDict()) == ["attention_mask", "input_ids"]


def test_prompting_recipe_with_target(spark):
    tok = tiny_bert_tokenizer()
    recipe = PromptingRecipe(
        tokenizer=tok,
        source_template="{q}",
        source_add_bos_token=False,
        target_template="{ans}",
        target_output_name="labels",
    )
    df = spark.createDataFrame(
        [("hello world", "test")], "q: string, ans: string"
    )
    out = recipe.map(df).collect()[0]
    assert out.input_ids == [4, 5]
    assert out.labels == [9]


def test_jinja_recipe(spark):
    tok = tiny_bert_tokenizer()
    recipe = JinjaRecipe(
        tokenizer=tok,
        jinja_template="{{q}} is|||{{a}}",
        max_source_length_per_shot=4,
        max_target_length_per_shot=3,
    )
    df = spark.createDataFrame(
        [("hello world this test", "hi there hi there")],
        "q: string, a: string",
    )
    out = recipe.map(df).collect()[0]
    assert set(out.asDict()) == {"input_ids", "attention_mask", "labels"}
    # source truncated to 3 words + " is" prompt
    assert out.input_ids == [4, 5, 6, 7]  # hello world this is
    assert out.labels == [10, 11, 10]  # hi there hi (3-word budget)


def test_jinja_recipe_fewshot(spark):
    tok = tiny_bert_tokenizer()
    recipe = JinjaRecipe(
        tokenizer=tok,
        jinja_template=(
            "{% for s in __shots__ %}{{s.q}} {% endfor %}{{q}}"
        ),
        num_shots=1,
        order_by=["i"],
    )
    df = spark.createDataFrame(
        [(0, "hello"), (1, "world"), (2, "this"), (3, "test")],
        "i: bigint, q: string",
    )
    out = recipe.map(df).collect()
    got = sorted(tuple(r.input_ids) for r in out)
    assert got == [(4, 5), (6, 9)]  # "hello world", "this test"


def test_collator_recipe(spark):
    tok = tiny_bert_tokenizer()
    recipe = CollatorRecipe(tokenizer=tok, batch_size=2, order_by=["i"])
    df = spark.createDataFrame(
        [(0, [1, 2, 3]), (1, [4]), (2, [5, 6])],
        "i: bigint, input_ids: array<bigint>",
    )
    out = recipe.map(df).collect()
    batches = sorted((r.i, r.input_ids) for r in out)
    assert batches[0] == ([0, 1], [[1, 2, 3], [4, 0, 0]])
    assert batches[1] == ([2], [[5, 6]])
