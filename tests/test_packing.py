"""Sequence packing (functions/packing.py): brute-force equivalence,
block arithmetic edges (doc == block, doc >> block, empty docs,
separator), prefix-sum correctness, and plan shape."""

import random

import pytest
from pyspark.sql import functions as F

from smashed_spark.functions.packing import (
    PackSequencesMapper,
    with_prefix_sum,
)


def _docs(spark, token_lists):
    rows = [(i, t) for i, t in enumerate(token_lists)]
    return spark.createDataFrame(
        rows, "doc_id: bigint, input_ids: array<bigint>"
    )


def brute_pack(token_lists, block_size, separator=None):
    stream = []
    for t in token_lists:
        toks = list(t) + ([separator] if separator is not None else [])
        stream.extend(toks)
    blocks = {}
    for pos, tok in enumerate(stream):
        blocks.setdefault(pos // block_size, []).append(tok)
    return blocks


def _pack(spark, token_lists, **kw):
    out = PackSequencesMapper(**kw).map(_docs(spark, token_lists))
    return {r.block_id: list(r.tokens) for r in out.collect()}


def test_simple_concat_and_slice(spark):
    tl = [[1, 2, 3], [4, 5], [6, 7, 8, 9]]
    got = _pack(spark, tl, block_size=4)
    assert got == brute_pack(tl, 4)
    assert got[0] == [1, 2, 3, 4]
    assert got[1] == [5, 6, 7, 8]
    assert got[2] == [9]  # trailing partial block kept


def test_doc_spanning_many_blocks(spark):
    tl = [[0] * 3, list(range(100)), [7]]
    got = _pack(spark, tl, block_size=8)
    assert got == brute_pack(tl, 8)


def test_separator_appended_per_doc(spark):
    tl = [[1, 2], [], [3]]
    got = _pack(spark, tl, block_size=3, separator=99)
    # empty doc still contributes its separator
    assert got == brute_pack(tl, 3, separator=99)
    assert got[0] == [1, 2, 99]
    assert got[1] == [99, 3, 99]


def test_empty_docs_skipped_without_separator(spark):
    tl = [[], [1], [], [2, 3]]
    got = _pack(spark, tl, block_size=2)
    assert got == brute_pack(tl, 2)


def test_exact_block_boundary(spark):
    tl = [[1, 2, 3, 4], [5, 6, 7, 8]]
    got = _pack(spark, tl, block_size=4)
    assert got == {0: [1, 2, 3, 4], 1: [5, 6, 7, 8]}


def test_matches_bruteforce_random(spark):
    rng = random.Random(3)
    tl = [
        [rng.randrange(1000) for _ in range(rng.randrange(0, 40))]
        for _ in range(80)
    ]
    for bs in (1, 7, 32):
        assert _pack(spark, tl, block_size=bs) == brute_pack(tl, bs)


def test_n_docs_and_n_tokens(spark):
    tl = [[1, 2, 3], [4, 5], [6]]
    out = PackSequencesMapper(block_size=4).map(_docs(spark, tl))
    rows = {r.block_id: r for r in out.collect()}
    assert rows[0].n_tokens == 4 and rows[0].n_docs == 2
    assert rows[1].n_tokens == 2 and rows[1].n_docs == 2


def test_prefix_sum_matches_python(spark):
    rng = random.Random(9)
    vals = [rng.randrange(0, 50) for _ in range(500)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k: bigint, v: bigint"
    ).repartition(7)  # scramble so the orderBy really works
    out = with_prefix_sum(df, "v", ["k"], "ps")
    got = {r.k: r.ps for r in out.collect()}
    acc = 0
    for i, v in enumerate(vals):
        assert got[i] == acc, i
        acc += v


def test_param_validation():
    with pytest.raises(ValueError):
        PackSequencesMapper(block_size=0)
    with pytest.raises(ValueError):
        PackSequencesMapper(order_by=[])


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_plan_wide_payload_crosses_two_exchanges(spark):
    """The slim (key, count) projection absorbs the prefix-sum's range
    sort and pid-window shuffles; the WIDE token column must cross at
    most two exchanges (the start-offset join + the block agg).  No
    Python eval anywhere."""
    tl = [[1, 2, 3], [4, 5, 6, 7]]
    plan = _explain(PackSequencesMapper(block_size=4).map(_docs(spark, tl)))
    for py_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_node not in plan, plan
    assert "Cartesian" not in plan, plan
    # formatted details render each node as "(n) Exchange\nInput [k]:
    # [cols]" — count the exchanges whose input carries the token
    # payload column
    wide_exchanges = 0
    for detail in plan.split("\n\n"):
        if detail.startswith("(") and ") Exchange" in detail.splitlines()[0]:
            if "__t__" in detail:
                wide_exchanges += 1
    assert wide_exchanges <= 2, plan
