"""Exact substring dedup (functions/substring.py): hand-built corpora
with known duplicated spans, a brute-force window oracle on random
corpora, stride semantics, and span-merge island edge cases."""

import random

import pytest
from pyspark.sql import functions as F

from smashed_spark.functions.substring import (
    DuplicatedSpansMapper,
    DuplicatedWindowsMapper,
)


def _docs(spark, texts):
    rows = [(i, t.split(" ")) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id: bigint, words: array<string>")


def _win_rows(spark, texts, **kw):
    out = DuplicatedWindowsMapper(**kw).map(_docs(spark, texts))
    return {
        (r.doc_id, r.pos, r.n_occ)
        for r in out.select("doc_id", "pos", "n_occ").collect()
    }


def brute_windows(texts, width, stride=1, min_count=2):
    """Driver-side oracle: hash-free exact window counting."""
    from collections import Counter

    occ = Counter()
    wins = []
    for d, t in enumerate(texts):
        w = t.split(" ")
        for p in range(0, len(w) - width + 1, stride):
            key = " ".join(w[p : p + width])
            occ[key] += 1
            wins.append((d, p, key))
    return {
        (d, p, occ[k]) for d, p, k in wins if occ[k] >= min_count
    }


def test_shared_phrase_is_flagged_in_both_docs(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog tonight",
        "colorless green ideas the quick brown fox jumps over the wall",
        "completely unrelated words with no overlap at all here",
    ]
    got = _win_rows(spark, texts, width=5)
    assert got == brute_windows(texts, 5)
    # the shared 8-word phrase "the quick brown fox jumps over the"
    # yields duplicated 5-windows at offsets 0..3 in doc0, 3..6 in doc1
    assert {(0, 0, 2), (0, 1, 2), (1, 3, 2), (1, 4, 2)} <= got
    assert not any(d == 2 for d, _, _ in got)


def test_intra_document_repetition_counts(spark):
    texts = ["a b c d a b c d a b c d"]  # "a b c d" 3x
    got = _win_rows(spark, texts, width=4)
    assert got == brute_windows(texts, 4)
    # window at 0, 4, 8 is identical ("a b c d") -> n_occ >= 3
    assert (0, 0, 3) in got and (0, 4, 3) in got and (0, 8, 3) in got


def test_short_docs_produce_no_windows(spark):
    texts = ["a b", "a b", "x"]
    assert _win_rows(spark, texts, width=3) == set()


def test_stride_skips_offsets(spark):
    texts = [
        "z1 common phrase here z2 z3 z4 z5",
        "z6 z7 common phrase here z8 z9 z0",
    ]
    # stride 2: doc0 windows at 0,2,4; doc1 at 0,2,4.  The shared
    # 3-window "common phrase here" sits at pos 1 in doc0 (not
    # sampled) and pos 2 in doc1 (sampled) -> no duplicate is seen:
    # stride trades recall for cost exactly as documented.
    assert _win_rows(spark, texts, width=3, stride=2) == set()
    # stride 1 catches it
    got = _win_rows(spark, texts, width=3, stride=1)
    assert {(0, 1, 2), (1, 2, 2)} <= got


def test_windows_match_bruteforce_on_random_corpus(spark):
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 40)))
        for _ in range(60)
    ]
    for width, stride in [(3, 1), (5, 2)]:
        got = _win_rows(spark, texts, width=width, stride=stride)
        assert got == brute_windows(texts, width, stride)


def test_md5_and_xxhash_agree(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(10)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(20)) for _ in range(40)
    ]
    a = _win_rows(spark, texts, width=4, hash_fn="xxhash64")
    b = _win_rows(spark, texts, width=4, hash_fn="md5")
    assert a == b


def _spans(spark, texts, **kw):
    out = DuplicatedSpansMapper(**kw).map(_docs(spark, texts))
    return {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in out.collect()
    }


def brute_spans(texts, width, stride=1, min_count=2):
    wins = brute_windows(texts, width, stride, min_count)
    by_doc = {}
    for d, p, _ in wins:
        by_doc.setdefault(d, []).append(p)
    spans = set()
    for d, ps in by_doc.items():
        ps.sort()
        start, end, n = ps[0], ps[0] + width, 1
        for p in ps[1:]:
            if p > end:
                spans.add((d, start, end, n))
                start, end, n = p, p + width, 1
            else:
                end, n = max(end, p + width), n + 1
        spans.add((d, start, end, n))
    return spans


def test_overlapping_windows_merge_to_one_span(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog tonight",
        "intro words then the quick brown fox jumps over the lazy dog",
    ]
    got = _spans(spark, texts, width=5)
    assert got == brute_spans(texts, 5)
    # doc0: the whole 10-word shared prefix "the quick … lazy dog"
    # merges into one span [0, 9); doc1 span starts at word 3
    assert (0, 0, 9, 5) in got
    assert (1, 3, 12, 5) in got


def test_disjoint_repeats_stay_separate_spans(spark):
    texts = ["p q r s xx1 yy zz2 ww p q r s", "p q r s k1 k2 k3 k4"]
    got = _spans(spark, texts, width=4)
    assert got == brute_spans(texts, 4)
    # doc0 has two islands: [0,4) and [8,12)
    assert (0, 0, 4, 1) in got and (0, 8, 12, 1) in got


def test_adjacent_touching_windows_merge(spark):
    """pos == prev end exactly: [0,4) and [4,8) touch -> one span
    (end-exclusive semantics: contiguous coverage, no gap)."""
    texts = ["a b c d e f g h", "a b c d q w e r", "x y z e f g h u"]
    got = _spans(spark, texts, width=4)
    assert got == brute_spans(texts, 4)


def test_spans_match_bruteforce_on_random_corpus(spark):
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30)))
        for _ in range(50)
    ]
    assert _spans(spark, texts, width=3) == brute_spans(texts, 3)


def test_param_validation():
    with pytest.raises(ValueError):
        DuplicatedWindowsMapper(width=0)
    with pytest.raises(ValueError):
        DuplicatedWindowsMapper(stride=0)
    with pytest.raises(ValueError):
        DuplicatedWindowsMapper(min_count=1)
    with pytest.raises(ValueError):
        DuplicatedWindowsMapper(hash_fn="sha1")


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_windows_plan_is_one_exchange_no_join(spark):
    """Plan shape: the duplicate count is ONE exchange (hash key);
    no join, no cartesian, no Python in the plan."""
    df = _docs(spark, ["a b c d e f", "a b c d x y"])
    plan = _explain(DuplicatedWindowsMapper(width=4).map(df))
    assert "Join" not in plan and "Cartesian" not in plan, plan
    assert plan.count("Exchange (") == 1, plan
    for py_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_node not in plan, plan


def test_spans_plan_adds_one_narrow_exchange(spark):
    """Span merge adds exactly one more exchange (per-doc), reusing
    the duplicated-window stream — two total, still no join."""
    df = _docs(spark, ["a b c d e f", "a b c d x y"])
    plan = _explain(DuplicatedSpansMapper(width=4).map(df))
    assert "Join" not in plan and "Cartesian" not in plan, plan
    assert plan.count("Exchange (") == 2, plan


# ---------------------------------------------------------------------------
# paragraph dedup
# ---------------------------------------------------------------------------


def brute_para_dedup(rows, sep="\n", min_chars=0):
    seen = set()
    out = {}
    for doc_id, text in rows:  # rows already in (id) order
        kept, removed = [], 0
        for p in text.split(sep):
            if len(p) < min_chars:
                kept.append(p)
                continue
            if p in seen:
                removed += 1
            else:
                seen.add(p)
                kept.append(p)
        out[doc_id] = (sep.join(kept), removed)
    return out


def _para(spark, rows, **kw):
    from smashed_spark.functions.substring import DedupParagraphsMapper

    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    got = DedupParagraphsMapper(**kw).map(df)
    return {r.doc_id: (r.text, r.n_removed) for r in got.collect()}


def test_para_dedup_cross_and_intra_document(spark):
    rows = [
        (0, "alpha\nbeta\nalpha"),
        (1, "beta\ngamma"),
        (2, "delta"),
    ]
    got = _para(spark, rows)
    assert got == brute_para_dedup(rows)
    assert got[0] == ("alpha\nbeta", 1)
    assert got[1] == ("gamma", 1)
    assert got[2] == ("delta", 0)


def test_para_dedup_first_occurrence_by_doc_order(spark):
    rows = [(5, "x"), (3, "x"), (9, "x")]
    got = _para(spark, rows)
    # doc 3 is the smallest (id, pos) -> it keeps the paragraph
    assert got[3] == ("x", 0)
    assert got[5] == ("", 1) and got[9] == ("", 1)


def test_para_dedup_min_chars_exemption(spark):
    rows = [(0, "##\nlong paragraph one"), (1, "##\nlong paragraph one")]
    got = _para(spark, rows, min_chars=5)
    assert got == brute_para_dedup(rows, min_chars=5)
    assert got[1] == ("##", 1)  # short '##' exempt, long para deduped


def test_para_dedup_random_matches_bruteforce(spark):
    rng = random.Random(21)
    paras = [f"para number {i}" for i in range(30)]
    rows = [
        (
            d,
            "\n".join(
                rng.choice(paras)
                for _ in range(rng.randint(1, 8))
            ),
        )
        for d in range(60)
    ]
    assert _para(spark, rows) == brute_para_dedup(rows)


def test_para_dedup_exact_under_forced_hash_collision(spark, monkeypatch):
    """The first-occurrence window partitions by (hash, paragraph), so
    two DISTINCT paragraphs whose 64-bit hashes collide must NOT merge.
    Force the worst case: every paragraph hashes to the same constant —
    the result must still be exact."""
    import smashed_spark.functions.substring as sub

    monkeypatch.setattr(
        sub.F, "xxhash64", lambda *cols: F.lit(0).cast("bigint")
    )
    rng = random.Random(33)
    paras = [f"collide me {i}" for i in range(20)]
    rows = [
        (
            d,
            "\n".join(
                rng.choice(paras) for _ in range(rng.randint(1, 6))
            ),
        )
        for d in range(40)
    ]
    assert _para(spark, rows) == brute_para_dedup(rows)


def test_para_dedup_carries_other_columns(spark):
    from smashed_spark.functions.substring import DedupParagraphsMapper

    df = spark.createDataFrame(
        [(0, "a\nb", "en"), (1, "a\nc", "de")],
        "doc_id: bigint, text: string, lang: string",
    )
    got = {r.doc_id: r for r in DedupParagraphsMapper().map(df).collect()}
    assert got[1].lang == "de" and got[1].text == "c"


def test_para_dedup_plan_two_exchanges_windowgrouplimit(spark):
    from smashed_spark.functions.substring import DedupParagraphsMapper

    df = spark.createDataFrame(
        [(0, "a\nb"), (1, "a\nc")], "doc_id: bigint, text: string"
    )
    plan = _explain(DedupParagraphsMapper().map(df))
    assert "WindowGroupLimit" in plan, plan
    for py_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_node not in plan, plan


def test_para_dedup_regex_metachar_separator(spark):
    """sep is a literal, not a regex: '.' must split on dots only."""
    rows = [(0, "alpha.beta.alpha"), (1, "beta.gamma")]
    got = _para(spark, rows, sep=".")
    assert got == brute_para_dedup(rows, sep=".")
    assert got[0] == ("alpha.beta", 1)
    assert got[1] == ("gamma", 1)


# ---------------------------------------------------------------- #
# RemoveDuplicatedSpansMapper: the ExactSubstr removal step          #
# ---------------------------------------------------------------- #


def _remove_oracle(corpus, width, min_count, scope):
    """Driver-side replay: rank window occurrences per (scope-)key by
    (doc, pos); rank>=2 occurrences of keys with count>=min_count are
    removable; merge islands per doc; cut word ranges."""
    wins = []  # (key, doc, pos)
    for doc_id, words in corpus:
        for p in range(len(words) - width + 1):
            key = " ".join(words[p : p + width])
            if scope == "document":
                key = (doc_id, key)
            wins.append((key, doc_id, p))
    from collections import defaultdict

    by_key = defaultdict(list)
    for key, d, p in wins:
        by_key[key].append((d, p))
    removable = defaultdict(list)
    for key, occs in by_key.items():
        if len(occs) >= min_count:
            for d, p in sorted(occs)[1:]:
                removable[d].append(p)
    out = {}
    for doc_id, words in corpus:
        cut = set()
        for p in removable.get(doc_id, ()):
            cut.update(range(p, p + width))
        kept = [w for i, w in enumerate(words) if i not in cut]
        out[doc_id] = (kept, len(words) - len(kept))
    return out


@pytest.mark.parametrize("scope", ["corpus", "document"])
def test_remove_duplicated_spans_matches_bruteforce(spark, scope):
    from smashed_spark.functions.substring import (
        RemoveDuplicatedSpansMapper,
    )

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(30)]
    # exactly width words and internally distinct: one window per
    # occurrence, so the kept first occurrence survives intact (runs
    # LONGER than width self-overlap and the kept window can lose its
    # tail to a neighboring cut — documented, oracle replays it)
    boiler = ["dup1", "dup2", "dup3", "dup4"]
    corpus = []
    for d in range(12):
        words = [vocab[rng.randrange(30)] for _ in range(40)]
        if d % 3 == 0:
            words[5:5] = boiler  # cross-doc duplicate
        if d == 7:
            words += boiler + ["mid"] + boiler  # in-doc repetition
        corpus.append((d, words))
    df = spark.createDataFrame(
        corpus, "doc_id: bigint, words: array<string>"
    )
    got = {
        r.doc_id: (list(r.clean_words), r.n_removed_words)
        for r in RemoveDuplicatedSpansMapper(
            width=4, min_count=2, scope=scope
        ).map(df).collect()
    }
    want = _remove_oracle(corpus, 4, 2, scope)
    assert got == want
    # at least one copy of the planted run survives somewhere
    survivors = sum(
        " ".join(w).count("dup1 dup2 dup3 dup4") for w, _ in got.values()
    )
    assert survivors >= 1


def test_remove_spans_document_scope_keeps_cross_doc_copies(spark):
    """scope='document' must NOT touch text duplicated only across
    documents — it trims self-repetition only."""
    from smashed_spark.functions.substring import (
        RemoveDuplicatedSpansMapper,
    )

    shared = [f"s{i}" for i in range(8)]
    rows = [(0, shared), (1, shared)]
    df = spark.createDataFrame(rows, "doc_id: bigint, words: array<string>")
    out = RemoveDuplicatedSpansMapper(
        width=4, min_count=2, scope="document"
    ).map(df)
    assert {r.n_removed_words for r in out.collect()} == {0}
