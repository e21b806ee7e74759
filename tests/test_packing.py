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


def test_duplicate_order_keys_raise(spark):
    """A non-total order_by key silently corrupted output before the
    guard (ambiguous offsets + join fan-out duplicating fragments);
    now it must raise loudly, in both the helper and the mapper."""
    df = spark.createDataFrame(
        [(1, 5), (1, 7), (2, 3)], "k: bigint, v: bigint"
    )
    with pytest.raises(ValueError, match="not a total key"):
        with_prefix_sum(df, "v", ["k"], "ps")
    # explicit opt-out still works (prefix values of ties arbitrary)
    out = with_prefix_sum(df, "v", ["k"], "ps", require_unique=False)
    assert out.count() == 3
    dup_docs = spark.createDataFrame(
        [(0, [1, 2]), (0, [3]), (1, [4])],
        "doc_id: bigint, input_ids: array<bigint>",
    )
    with pytest.raises(ValueError, match="not a total key"):
        PackSequencesMapper(block_size=4).map(dup_docs).collect()


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


# ---------------------------------------------------------------------------
# bin packing (whole documents, SFT-style)
# ---------------------------------------------------------------------------


def _binpack(spark, token_lists, **kw):
    from smashed_spark.functions.packing import BinPackSequencesMapper

    df = _docs(spark, token_lists)
    return BinPackSequencesMapper(**kw).map(df).collect()


def test_binpack_no_doc_split_and_capacity(spark):
    rng = random.Random(23)
    tl = [
        [rng.randrange(100) for _ in range(rng.randrange(1, 20))]
        for _ in range(120)
    ]
    bins = _binpack(spark, tl, block_size=32, num_groups=8)
    seen_docs = []
    for b in bins:
        assert not b.oversize
        assert b.n_tokens <= 32
        assert b.n_tokens == len(b.tokens) == sum(
            len(tl[d]) for d in b.doc_ids
        )
        assert b.n_docs == len(b.doc_ids)
        # tokens are the docs' streams concatenated in doc_ids order
        expect = [t for d in b.doc_ids for t in tl[d]]
        assert list(b.tokens) == expect
        seen_docs.extend(b.doc_ids)
    assert sorted(seen_docs) == list(range(120))  # nothing dropped


def test_binpack_oversize_isolated(spark):
    tl = [[1] * 50, [2, 3], [4] * 50, [5]]
    bins = _binpack(spark, tl, block_size=8, num_groups=2)
    over = [b for b in bins if b.oversize]
    norm = [b for b in bins if not b.oversize]
    assert {b.doc_ids[0] for b in over} == {0, 2}
    assert all(b.n_docs == 1 for b in over)
    assert sorted(d for b in norm for d in b.doc_ids) == [1, 3]


def test_binpack_deterministic_across_partitioning(spark):
    rng = random.Random(29)
    tl = [
        [rng.randrange(9) for _ in range(rng.randrange(1, 15))]
        for _ in range(100)
    ]
    from smashed_spark.functions.packing import BinPackSequencesMapper

    a = BinPackSequencesMapper(block_size=16, num_groups=4).map(
        _docs(spark, tl)
    )
    b = BinPackSequencesMapper(block_size=16, num_groups=4).map(
        _docs(spark, tl).repartition(17)
    )
    ka = {(r.pack_id, tuple(r.doc_ids)) for r in a.collect()}
    kb = {(r.pack_id, tuple(r.doc_ids)) for r in b.collect()}
    assert ka == kb


def test_binpack_ffd_utilization(spark):
    """FFD within each group: every bin except at most one per group
    must be more than half full (classic FFD property)."""
    rng = random.Random(41)
    tl = [
        [0] * rng.randrange(1, 16) for _ in range(300)
    ]
    bins = _binpack(spark, tl, block_size=32, num_groups=4)
    by_group = {}
    for b in bins:
        by_group.setdefault(b.pack_id >> 40, []).append(b)
    for g, bs in by_group.items():
        under = [b for b in bs if b.n_tokens <= 16]
        assert len(under) <= 1, (g, [b.n_tokens for b in bs])


def test_binpack_validation(spark):
    from smashed_spark.functions.packing import BinPackSequencesMapper

    import pytest as _pt

    with _pt.raises(ValueError):
        BinPackSequencesMapper(block_size=0)
    with _pt.raises(ValueError):
        BinPackSequencesMapper(num_groups=0)
    with _pt.raises(ValueError):
        BinPackSequencesMapper(hash_fn="sha1")


def test_binpack_md5_groups_replayable_in_python(spark):
    """hash_fn='md5' (the pack_bins gate path) assigns groups with the
    engine-portable md5-prefix hash — a driver-side hashlib replay must
    predict every document's group, which is what makes the gate's
    Python FFD replay oracle valid."""
    import hashlib

    rng = random.Random(47)
    tl = [
        [rng.randrange(9) for _ in range(rng.randrange(1, 12))]
        for _ in range(80)
    ]
    bins = _binpack(
        spark, tl, block_size=16, num_groups=8, hash_fn="md5"
    )
    for b in bins:
        gid = b.pack_id >> 40
        for d in b.doc_ids:
            expect = (
                int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 8
            )
            assert gid == expect, (d, gid, expect)
    # same packing invariants as the xxhash path
    assert sorted(d for b in bins for d in b.doc_ids) == list(range(80))
    assert all(b.oversize or b.n_tokens <= 16 for b in bins)


def test_prefix_sum_null_key_raises_clearly(spark):
    """A NULL order key is its own totality violation — it must raise
    the NULL-specific message, not a bogus 'duplicate row' count
    (count_distinct skips NULLs, which used to miscount)."""
    from smashed_spark.functions.packing import with_prefix_sum

    df = spark.createDataFrame(
        [(1, 4), (None, 2), (3, 1)], "doc_id: bigint, n: bigint"
    )
    with pytest.raises(ValueError, match="NULL-keyed"):
        with_prefix_sum(df, "n", ["doc_id"])
