"""Real-HF-tokenizer certification for the tokenizer mappers.

The hermetic gates run against the built-in deterministic WordPiece
(functions/wordpiece.py).  The reference additionally exercises real
tokenizers (reference tests/test_tokenize_mappers.py:70-74); this
module does the same when ``transformers`` is importable — building a
``BertTokenizerFast`` from the SAME tiny vocab the built-in fixture
uses, so the adapter and the built-in's HF parity are both certified —
and skips cleanly otherwise (transformers is not in the hermetic
container).
"""

from __future__ import annotations

import pytest

transformers = pytest.importorskip("transformers")

from smashed_spark.functions.wordpiece import (  # noqa: E402
    TINY_BERT_VOCAB,
    tiny_bert_tokenizer,
)
from smashed_spark.operators.hf_tokenize import TokenizerMapper  # noqa: E402

TEXTS = [
    "hello world this is a test",
    "hi there",
    "many with the of hello",
    "unknownword hello",
    "",
]


@pytest.fixture(scope="module")
def real_tokenizer(tmp_path_factory):
    vocab = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    vocab.write_text("\n".join(TINY_BERT_VOCAB) + "\n")
    return transformers.BertTokenizerFast(
        vocab_file=str(vocab), model_max_length=32, do_lower_case=True
    )


def _run(spark, tokenizer, **kw):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text: string")
    out = TokenizerMapper(tokenizer, "text", **kw).map(df)
    rows = out.orderBy("text").collect()
    return [r.asDict() for r in rows]


def test_real_tokenizer_matches_builtin(spark, real_tokenizer):
    real = _run(spark, real_tokenizer, truncation=True, max_length=8)
    builtin = _run(
        spark, tiny_bert_tokenizer(), truncation=True, max_length=8
    )
    for a, b in zip(real, builtin):
        assert a["input_ids"] == b["input_ids"], a["text"]
        assert a["attention_mask"] == b["attention_mask"], a["text"]


def test_real_tokenizer_overflow_and_word_ids(spark, real_tokenizer):
    kw = dict(
        truncation=True,
        max_length=6,
        return_overflowing_tokens=True,
        stride=2,
        return_word_ids=True,
    )
    real = _run(spark, real_tokenizer, **kw)
    builtin = _run(spark, tiny_bert_tokenizer(), **kw)
    for a, b in zip(real, builtin):
        assert a["input_ids"] == b["input_ids"], a["text"]
        assert a["word_ids"] == b["word_ids"], a["text"]
