"""FixedBatchSize / text splitters / glom (reference: batchers.py,
text.py, glom.py semantics)."""

import pytest

from smashed_spark.operators.batchers import FixedBatchSizeMapper
from smashed_spark.operators.glom import GlomMapper
from smashed_spark.operators.text import TextToWordsMapper, WordsToTextMapper


def _nums(spark, n=5):
    return spark.createDataFrame([(i, i * i) for i in range(n)], "i: bigint, v: bigint")


def test_batcher_basic(spark):
    out = (
        FixedBatchSizeMapper(2, order_by=["i"])
        .map(_nums(spark))
        .orderBy("i")
        .collect()
    )
    assert [r.i for r in out] == [[0, 1], [2, 3], [4]]
    assert [r.v for r in out] == [[0, 1], [4, 9], [16]]


def test_batcher_drop_last(spark):
    out = FixedBatchSizeMapper(2, keep_last=False, order_by=["i"]).map(
        _nums(spark)
    ).collect()
    assert sorted(r.i for r in out) == [[0, 1], [2, 3]]


def test_batcher_max(spark):
    out = FixedBatchSizeMapper("max", order_by=["i"]).map(_nums(spark)).collect()
    assert len(out) == 1
    assert out[0].i == [0, 1, 2, 3, 4]


def test_batcher_contiguous_key(spark):
    out = (
        FixedBatchSizeMapper(2, order_by=["i"], contiguous_key=True)
        .map(_nums(spark))
        .orderBy("i")
        .collect()
    )
    assert [r.i for r in out] == [[0, 1], [2, 3], [4]]


def test_batcher_validation(spark):
    with pytest.raises(ValueError):
        FixedBatchSizeMapper(0, order_by=["i"])
    with pytest.raises(ValueError):
        FixedBatchSizeMapper(2)
    with pytest.raises(ValueError):
        FixedBatchSizeMapper(2, keep_last="yes", order_by=["i"])


def test_text_to_words_plus(spark):
    df = spark.createDataFrame([("many  hello world, bye!",)], "t: string")
    out = TextToWordsMapper("t", splitter="plus").map(df).collect()[0]
    assert out.t == ["many", "hello", "world", ",", "bye", "!"]


def test_text_to_words_ws(spark):
    df = spark.createDataFrame([("a b,c  d ",)], "t: string")
    out = TextToWordsMapper("t", splitter="ws").map(df).collect()[0]
    assert out.t == ["a", "b,c", "d"]


def test_text_to_words_trail(spark):
    df = spark.createDataFrame([("ab  cd e",)], "t: string")
    out = TextToWordsMapper("t", splitter="trail").map(df).collect()[0]
    assert out.t == ["ab  ", "cd ", "e"]
    assert "".join(out.t) == "ab  cd e"


def test_text_to_words_nested(spark):
    df = spark.createDataFrame([((["a b", "c"]),)], "t: array<string>")
    out = TextToWordsMapper("t").map(df).collect()[0]
    assert out.t == [["a", "b"], ["c"]]


def test_words_roundtrip(spark):
    df = spark.createDataFrame([("hello world test",)], "t: string")
    pipe = TextToWordsMapper("t", splitter="ws") >> WordsToTextMapper("t")
    out = pipe.map(df).collect()[0]
    assert out.t == "hello world test"


def test_words_to_text_nested(spark):
    df = spark.createDataFrame(
        [([["a", "b"], ["c"]],)], "t: array<array<string>>"
    )
    out = WordsToTextMapper("t", joiner="-").map(df).collect()[0]
    assert out.t == ["a-b", "c"]


def test_glom_path(spark):
    # F9 SQuAD-shaped nested row (reference tests/test_glom.py)
    df = spark.createDataFrame(
        [("x1", (["ans1", "ans2"], [0, 5]))],
        "id: string, answers: struct<text: array<string>, starts: array<bigint>>",
    )
    out = GlomMapper(
        {"flat_text": ("answers", "text"), "dotted": "answers.text"}
    ).map(df).collect()[0]
    assert out.flat_text == ["ans1", "ans2"]
    assert out.dotted == ["ans1", "ans2"]


def test_glom_fanout(spark):
    df = spark.createDataFrame(
        [([("q1", "a1"), ("q2", "a2")],)],
        "qas: array<struct<q: string, a: string>>",
    )
    out = GlomMapper({"questions": ("qas", [("q",)])}).map(df).collect()[0]
    assert out.questions == ["q1", "q2"]


def test_glom_reference_empty_tuple_chain(spark):
    # the reference's own test spec ('answers', 'text', ()) — an empty
    # tuple chain is identity (reference tests/test_glom.py:101-123)
    df = spark.createDataFrame(
        [
            ("56be4db0", (["Denver Broncos"] * 3, [177, 177, 177])),
            ("572763a8", (["chairman and CEO", "chairman and CEO", "chairman"], [103, 103, 103])),
        ],
        "id: string, answers: struct<text: array<string>, answer_start: array<bigint>>",
    )
    out = (
        GlomMapper({"answers": ("answers", "text", tuple())})
        .map(df)
        .orderBy("id")
        .collect()
    )
    assert out[0].answers == ["Denver Broncos"] * 3
    assert out[1].answers == ["chairman and CEO", "chairman and CEO", "chairman"]


def test_glom_exotic_specs_python_tier(spark):
    """Specs beyond path+fanout run through the pyglom fallback:
    mid-position fanout, dict multi-extract, and callables."""
    df = spark.createDataFrame(
        [([("q1", ["a1", "a2"]), ("q2", ["a3"])],)],
        "qas: array<struct<q: string, answers: array<string>>>",
    )
    out = GlomMapper(
        {
            # fanout NOT in last position: per-qa first answer
            "first_answers": ("qas", [("answers", lambda xs: list(xs)[0])]),
            # dict spec
            "packed": {"n": ("qas", len)},
        },
        output_types={
            "first_answers": "array<string>",
            "packed": "struct<n: bigint>",
        },
    ).map(df).collect()[0]
    assert out.first_answers == ["a1", "a3"]
    assert out.packed.n == 2


def test_glom_exotic_without_types_raises(spark):
    df = spark.createDataFrame([("x",)], "a: string")
    with pytest.raises(ValueError, match="output_types"):
        GlomMapper({"b": ("a", lambda v: v)}).map(df)


def test_pyglom_interpreter():
    from smashed_spark.operators.glom import pyglom

    data = {"a": {"b": [{"c": 1}, {"c": 2}]}}
    assert pyglom(data, "a.b") == [{"c": 1}, {"c": 2}]
    assert pyglom(data, ("a", "b", ["c"])) == [1, 2]
    assert pyglom(data, {"n": ("a", "b", len)}) == {"n": 2}
    assert pyglom(data, ("a", "b", [("c",)], sum)) == 3


def test_trail_roundtrip_reference_golden(spark):
    # reference golden (tests/test_text2words.py:8-15): trail split +
    # empty joiner reconstructs the original text exactly
    text = "Hello world! What a beautiful day...\nOR NOT?"
    df = spark.createDataFrame([(text,)], "text: string")
    pipe = TextToWordsMapper("text", splitter="trail") >> WordsToTextMapper(
        "text", joiner=""
    )
    out = pipe.map(df).collect()[0]
    assert out.text == text


def test_text_to_words_unicode_splitter(spark):
    """The blingfire-approximating backend: Unicode letter runs keep
    diacritics and inner apostrophes, digits split from letters,
    punctuation tokens stand alone."""
    from smashed_spark.operators.text import TextToWordsMapper

    df = spark.createDataFrame(
        [("Crème brûlée, s'il-vous-plaît: 42 fois!",),
         ("naïve café—déjà vu…",)],
        "text: string",
    )
    out = [r.text for r in TextToWordsMapper("text", splitter="unicode").map(df).collect()]
    assert out[0] == [
        "Crème", "brûlée", ",", "s'il", "-", "vous", "-", "plaît",
        ":", "42", "fois", "!",
    ]
    assert out[1] == ["naïve", "café", "—", "déjà", "vu", "…"]
