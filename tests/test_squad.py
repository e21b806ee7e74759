"""SQuAD recipe family (reference contrib/squad.py:198-489)."""

from smashed_spark.functions.wordpiece import tiny_bert_tokenizer
from smashed_spark.recipes.squad import (
    EncoderWithEvidenceLocationMapper,
    ReplaceIfNoEvidencePromptTemplateMapper,
    SquadPromptTrainRecipe,
    StriderWithEvidenceLocationMapper,
)


def test_encoder_with_evidence_location(spark):
    tok = tiny_bert_tokenizer()
    # context "hello world this is a test": char span of "this is" = [12, 19]
    df = spark.createDataFrame(
        [("hello world this is a test", [[12, 19]])],
        "context: string, locations: array<array<bigint>>",
    )
    out = EncoderWithEvidenceLocationMapper(tok).map(df).collect()[0]
    assert out.context == [4, 5, 6, 7, 8, 9]
    # tokens "this"(2) and "is"(3) -> token span [2, 4)
    assert out.locations == [[2, 4]]


def test_encoder_missing_evidence(spark):
    tok = tiny_bert_tokenizer()
    df = spark.createDataFrame(
        [("hello world", [[-1, -1]])],
        "context: string, locations: array<array<bigint>>",
    )
    out = EncoderWithEvidenceLocationMapper(tok).map(df).collect()[0]
    assert out.locations == [[-1, -1]]


def test_strider_with_locations_costrides(spark):
    df = spark.createDataFrame(
        [([1, 2, 3, 4], [0, 1, 0, 0], "tag")],
        "context: array<bigint>, locations: array<bigint>, extra: string",
    )
    out = (
        StriderWithEvidenceLocationMapper(max_length=2, stride=2)
        .map(df)
        .collect()
    )
    got = sorted((tuple(r.context), tuple(r.locations)) for r in out)
    assert got == [((1, 2), (0, 1)), ((3, 4), (0, 0))]
    assert all(r.extra == "tag" for r in out)


def test_replace_if_no_evidence_template(spark):
    tok = tiny_bert_tokenizer()
    df = spark.createDataFrame(
        [([0, 1, 0], [99], [4]), ([0, 0, 0], [99], [4])],
        "locations: array<bigint>, labels: array<bigint>, hint: array<bigint>",
    )
    out = (
        ReplaceIfNoEvidencePromptTemplateMapper(
            template="hello{hint}", tokenizer=tok
        )
        .map(df)
        .collect()
    )
    got = sorted(tuple(r.labels) for r in out)
    # with evidence: keep [99]; without: enc("hello")+hint = [4, 4]
    assert got == [(4, 4), (99,)]


def test_squad_train_recipe_end_to_end(spark):
    tok = tiny_bert_tokenizer()
    recipe = SquadPromptTrainRecipe(
        tokenizer=tok,
        source_template="{context}",
        context_length=4,
        context_stride=4,
        target_template="{labels}",
    )
    df = spark.createDataFrame(
        [
            (
                ["hello world this is a test", "hi there"],
                ["this is"],
                ["this is"],
            )
        ],
        "context: array<string>, answers: array<string>, "
        "evidences: array<string>",
    )
    out = recipe.map(df)
    rows = out.collect()
    # context of 8+ tokens strided into windows of 4 -> multiple rows
    assert len(rows) >= 2
    assert set(out.columns) == {"input_ids", "attention_mask", "labels"}
    assert all(len(r.input_ids) <= 4 for r in rows)
    assert all(len(r.labels) >= 1 for r in rows)


def test_squad_valid_recipe_keeps_all_answers(spark):
    from smashed_spark.recipes.squad import SquadPromptValidRecipe

    tok = tiny_bert_tokenizer()
    recipe = SquadPromptValidRecipe(
        tokenizer=tok,
        source_template="{context}",
        context_length=8,
        context_stride=8,
        target_template="hello",  # literal "no answer" replacement text
    )
    df = spark.createDataFrame(
        [
            (
                ["hello world this is a test"],
                ["this is", "a test"],
                ["this is"],
            )
        ],
        "context: array<string>, answers: array<string>, "
        "evidences: array<string>",
    )
    rows = recipe.map(df).collect()
    assert len(rows) == 1  # no unpacking: one row per question
    # both answers kept, each encoded
    assert rows[0].labels == [[6, 7], [8, 9]]
