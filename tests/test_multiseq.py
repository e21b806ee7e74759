"""Multi-sequence mappers (reference: src/smashed/mappers/multiseq.py
semantics)."""

import pytest

from smashed_spark.operators.multiseq import (
    AttentionMaskSequencePaddingMapper,
    LabelsMaskerMapper,
    MakeAttentionMaskMapper,
    MultiSequenceStriderMapper,
    SequencesConcatenateMapper,
    SingleValueToSequenceMapper,
    TokensSequencesPaddingMapper,
    TokenTypeIdsSequencePaddingMapper,
)

SCHEMA = "input_ids: array<array<bigint>>"


def test_tokens_sequences_padding(spark):
    df = spark.createDataFrame([([[1, 2], [3], [4, 5]],)], SCHEMA)
    out = (
        TokensSequencesPaddingMapper(bos=[101], sep=[102], eos=[103])
        .map(df)
        .collect()[0]
    )
    assert out.input_ids == [[101, 1, 2, 102], [3, 102], [4, 5, 103]]


def test_attention_mask_padding(spark):
    df = spark.createDataFrame(
        [([[1, 1], [1]],)], "attention_mask: array<array<bigint>>"
    )
    out = (
        AttentionMaskSequencePaddingMapper(bos=[101], sep=[102], eos=[103])
        .map(df)
        .collect()[0]
    )
    assert out.attention_mask == [[1, 1, 1, 1], [1, 1]]


def test_token_type_ids_padding(spark):
    # sep goes at the START of non-first seqs; eos at end of last
    df = spark.createDataFrame(
        [([[0, 0], [1, 1]],)], "token_type_ids: array<array<bigint>>"
    )
    out = (
        TokenTypeIdsSequencePaddingMapper(bos=[101], sep=[102], eos=[103])
        .map(df)
        .collect()[0]
    )
    assert out.token_type_ids == [[0, 0, 0], [1, 1, 1, 1]]


def test_make_attention_mask(spark):
    df = spark.createDataFrame([([[1, 2], [3]],)], SCHEMA)
    out = MakeAttentionMaskMapper().map(df).collect()[0]
    assert out.attention_mask == [[1, 1], [1]]


def test_labels_masker_one(spark):
    df = spark.createDataFrame(
        [("x", [1, 2])], "tag: string, labels: array<bigint>"
    )
    out = LabelsMaskerMapper(strategy="one").map(df).collect()
    got = sorted(tuple(r.labels) for r in out)
    assert got == [(-100, 2), (1, -100)]
    assert all(r.tag == "x" for r in out)


def test_labels_masker_sample(spark):
    labels = list(range(10))
    df = spark.createDataFrame([(labels,)], "labels: array<bigint>")
    out = LabelsMaskerMapper(
        strategy="sample", sample_prob=0.3, seed=7
    ).map(df).collect()
    # chunks of max(int(10*0.3),1)=3 -> ceil(10/3)=4 rows
    assert len(out) == 4
    active = sorted(
        v for r in out for v in r.labels if v != -100
    )
    # every label appears active exactly once across the partition
    assert active == labels
    # deterministic across runs
    out2 = LabelsMaskerMapper(
        strategy="sample", sample_prob=0.3, seed=7
    ).map(df).collect()
    assert sorted(map(tuple, (r.labels for r in out))) == sorted(
        map(tuple, (r.labels for r in out2))
    )


def test_labels_masker_validation():
    with pytest.raises(ValueError):
        LabelsMaskerMapper(strategy="bogus")
    with pytest.raises(ValueError):
        LabelsMaskerMapper(strategy="sample")
    with pytest.raises(ValueError):
        LabelsMaskerMapper(strategy="one", sample_prob=0.5)


def test_multiseq_strider_count(spark):
    df = spark.createDataFrame(
        [([[1], [2], [3]],), ([[4], [5], [6], [7], [8]],)], SCHEMA
    )
    out = MultiSequenceStriderMapper(
        max_stride_count=2, length_reference_field="input_ids"
    ).map(df)
    rows = sorted(r.input_ids for r in out.collect())
    assert rows == [[[1], [2]], [[3]], [[4], [5]], [[6], [7]], [[8]]]


def test_multiseq_strider_max_length(spark):
    df = spark.createDataFrame([([[1, 2], [3, 4], [5, 6]],)], SCHEMA)
    out = MultiSequenceStriderMapper(
        max_stride_count=10,
        length_reference_field="input_ids",
        max_length=4,
    ).map(df)
    rows = sorted(r.input_ids for r in out.collect())
    assert rows == [[[1, 2], [3, 4]], [[5, 6]]]


def test_multiseq_strider_empty_ref_array(spark):
    """An empty length-reference array passes the row through with
    empty lists (reference behavior), never null fields."""
    df = spark.createDataFrame([([],), ([[1], [2]],)], SCHEMA)
    out = MultiSequenceStriderMapper(
        max_stride_count=2, length_reference_field="input_ids"
    ).map(df)
    rows = sorted((r.input_ids for r in out.collect()), key=len)
    assert rows == [[], [[1], [2]]]
    assert all(r.input_ids is not None for r in out.collect())


def test_multiseq_strider_too_long_raises(spark):
    df = spark.createDataFrame([([[1, 2, 3, 4, 5]],)], SCHEMA)
    with pytest.raises(Exception):
        MultiSequenceStriderMapper(
            max_stride_count=2,
            length_reference_field="input_ids",
            max_length=3,
        ).map(df).collect()


def test_single_value_to_sequence(spark):
    df = spark.createDataFrame(
        [([5, 7], [[1, 2, 3], [4]])],
        "labels: array<bigint>, input_ids: array<array<bigint>>",
    )
    first = SingleValueToSequenceMapper("labels").map(df).collect()[0]
    assert first.labels == [[5, -100, -100], [7]]
    last = (
        SingleValueToSequenceMapper("labels", strategy="last")
        .map(df)
        .collect()[0]
    )
    assert last.labels == [[-100, -100, 5], [7]]
    alls = (
        SingleValueToSequenceMapper("labels", strategy="all")
        .map(df)
        .collect()[0]
    )
    assert alls.labels == [[5, 5, 5], [7]]


def test_sequences_concatenate(spark):
    df = spark.createDataFrame(
        [([[1, 2], [3]], [[9], [8]], "keep")],
        "a: array<array<bigint>>, b: array<array<bigint>>, c: string",
    )
    out = SequencesConcatenateMapper(["a"]).map(df).collect()[0]
    assert out.a == [1, 2, 3]
    assert out.b == [[9], [8]]
    out_all = SequencesConcatenateMapper().map(df).collect()[0]
    assert out_all.a == [1, 2, 3] and out_all.b == [9, 8] and out_all.c == "keep"
