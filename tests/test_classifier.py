"""Model-based quality filtering: hashed-BoW linear scorer + bounded
driver fit (functions/classifier.py)."""

import pytest
from pyspark.sql import functions as F

from smashed_spark.functions.classifier import (
    LinearQualityClassifierMapper,
    fit_quality_classifier,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id: bigint, text: string"
    ).withColumn("words", F.split("text", " "))


def test_scoring_matches_python_replay(spark):
    """Spark score == driver replay with the same md5 feature hashing
    (portable convention), and scores are partition-invariant."""
    import hashlib
    import math

    dims = 64
    weights = [((i * 37) % 21 - 10) / 10.0 for i in range(dims)]
    bias = 0.25
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "epsilon zeta"),
        (2, "alpha alpha alpha"),
        (3, ""),
    ]
    df = _docs(spark, rows)
    m = LinearQualityClassifierMapper(weights, bias=bias)
    got = {r.doc_id: r.model_q_score for r in m.map(df).collect()}

    def idx(w):
        return int(hashlib.md5(w.lower().encode()).hexdigest()[:8], 16) % dims

    for doc_id, text in rows:
        ws = text.split(" ")  # split('', ' ') -> [''] in Spark too
        s = sum(weights[idx(w)] for w in ws)
        z = bias + s / max(len(ws), 1)
        want = 1.0 / (1.0 + math.exp(-z))
        assert abs(got[doc_id] - want) < 1e-12, doc_id

    re = {
        r.doc_id: r.model_q_score
        for r in m.map(df.repartition(5)).collect()
    }
    assert re == got


def test_threshold_tags_and_plan_is_narrow(spark):
    df = _docs(spark, [(0, "good stuff"), (1, "bad junk")])
    m = LinearQualityClassifierMapper(
        [0.0] * 32, bias=0.0, threshold=0.5
    )
    out = m.map(df)
    # sigmoid(0) = 0.5 exactly -> everything tagged keep at thr 0.5
    assert [r.model_q_keep for r in out.collect()] == [1, 1]
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan  # scan-speed contract


def test_validation(spark):
    with pytest.raises(ValueError, match="non-empty"):
        LinearQualityClassifierMapper([])
    with pytest.raises(ValueError, match="MAX_NARROW_DIMS"):
        LinearQualityClassifierMapper([0.0] * 70000)
    with pytest.raises(ValueError, match="hash_fn"):
        LinearQualityClassifierMapper([0.0], hash_fn="sha1")


def test_fit_separates_classes_and_is_deterministic(spark):
    """A fit on two disjoint-vocabulary classes must rank every
    positive above every negative, for BOTH hash families, and yield
    identical weights across runs (seeded, fixed epochs)."""
    import random

    rng = random.Random(5)
    good_vocab = [f"good{i}" for i in range(40)]
    bad_vocab = [f"bad{i}" for i in range(40)]
    pos = _docs(
        spark,
        [(i, " ".join(rng.choices(good_vocab, k=12))) for i in range(60)],
    )
    neg = _docs(
        spark,
        [(i, " ".join(rng.choices(bad_vocab, k=12))) for i in range(60)],
    )
    for fn in ("md5", "xxhash64"):
        w, b = fit_quality_classifier(
            pos, neg, dims=256, epochs=120, hash_fn=fn
        )
        w2, b2 = fit_quality_classifier(
            pos, neg, dims=256, epochs=120, hash_fn=fn
        )
        assert w == w2 and b == b2  # deterministic
        m = LinearQualityClassifierMapper(w, bias=b, hash_fn=fn)
        ps = [r.model_q_score for r in m.map(pos).collect()]
        ns = [r.model_q_score for r in m.map(neg).collect()]
        assert min(ps) > max(ns), (fn, min(ps), max(ns))
    # partition-layout invariance (ADVICE r7): the hash-ordered
    # sample makes the model a pure function of the data even when
    # sample_cap binds and the layout changes
    wa, ba = fit_quality_classifier(
        pos, neg, dims=128, epochs=50, sample_cap=30
    )
    wb, bb = fit_quality_classifier(
        pos.repartition(13), neg.coalesce(1), dims=128, epochs=50,
        sample_cap=30,
    )
    assert wa == wb and ba == bb


def test_fit_validation(spark):
    empty = _docs(spark, []).limit(0)
    docs = _docs(spark, [(0, "a b")])
    with pytest.raises(ValueError, match="at least one"):
        fit_quality_classifier(empty, docs, dims=16)
    with pytest.raises(ValueError, match="dims"):
        fit_quality_classifier(docs, docs, dims=0)


def test_unigram_logprob_matches_python_replay(spark):
    """Spark mean log-prob / perplexity == a full python replay of the
    hashed-count fit and the md5 bucket hashing; partition-invariant
    fit (exact counts); empty docs score NULL."""
    import hashlib
    import math

    from smashed_spark.functions.classifier import (
        UnigramLogProbMapper,
        fit_unigram_logprob_table,
    )

    dims, alpha = 32, 0.5
    ref_rows = [
        (0, "the quick brown fox"),
        (1, "the lazy dog"),
        (2, "the the the end"),
    ]
    ref = _docs(spark, ref_rows)
    table = fit_unigram_logprob_table(ref, dims=dims, alpha=alpha)
    assert len(table) == dims

    def bucket(w):
        return int(hashlib.md5(w.lower().encode()).hexdigest()[:8], 16) % dims

    counts = [0] * dims
    for _i, text in ref_rows:
        for w in text.split(" "):
            counts[bucket(w)] += 1
    total = sum(counts)
    want_table = [
        math.log((c + alpha) / (total + alpha * dims)) for c in counts
    ]
    assert all(abs(a - b) < 1e-12 for a, b in zip(table, want_table))
    # exact counts: the fit is partition-layout-invariant
    table2 = fit_unigram_logprob_table(
        ref.repartition(7), dims=dims, alpha=alpha
    )
    assert table == table2

    score_rows = [
        (10, "the quick fox"),       # reference-like
        (11, "zzz qqq www"),          # all OOV
        (12, ""),                     # no words -> NULL
    ]
    out = {
        r.doc_id: (r.mean_word_logprob, r.word_ppl)
        for r in UnigramLogProbMapper(table)
        .map(_docs(spark, score_rows))
        .collect()
    }
    for doc_id, text in score_rows[:2]:
        ws = text.split(" ")
        mean = sum(want_table[bucket(w)] for w in ws) / len(ws)
        got_lp, got_ppl = out[doc_id]
        assert abs(got_lp - mean) < 1e-12, doc_id
        assert abs(got_ppl - math.exp(-mean)) < 1e-9, doc_id
    # note: _docs splits '' into [''] (one empty word), matching the
    # Spark split convention — craft a truly-empty array instead
    empty = spark.createDataFrame(
        [(12,)], "doc_id: bigint"
    ).withColumn("words", F.expr("array()").cast("array<string>"))
    r = UnigramLogProbMapper(table).map(empty).collect()[0]
    assert r.mean_word_logprob is None and r.word_ppl is None
    # reference-like text is more probable than OOV text
    assert out[10][0] > out[11][0]
    assert out[10][1] < out[11][1]


def test_unigram_logprob_validation_and_plan_is_narrow(spark):
    from smashed_spark.functions.classifier import (
        UnigramLogProbMapper,
        fit_unigram_logprob_table,
    )

    with pytest.raises(ValueError, match="dims"):
        fit_unigram_logprob_table(_docs(spark, [(0, "a")]), dims=0)
    with pytest.raises(ValueError, match="alpha"):
        fit_unigram_logprob_table(_docs(spark, [(0, "a")]), alpha=0)
    with pytest.raises(ValueError, match="non-empty"):
        UnigramLogProbMapper([])
    with pytest.raises(ValueError, match="hash_fn"):
        UnigramLogProbMapper([0.1], hash_fn="sha1")
    df = _docs(spark, [(0, "a b c")])
    out = UnigramLogProbMapper([-1.0, -2.0]).map(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange (" not in plan  # scan-speed: zero exchanges


def test_unigram_fit_ignores_null_words(spark):
    """A NULL element inside a words array must not crash the fit —
    it carries no count (r8 review)."""
    from smashed_spark.functions.classifier import (
        fit_unigram_logprob_table,
    )

    df = spark.createDataFrame(
        [(0, ["a", None, "b"]), (1, ["a"])],
        "doc_id: bigint, words: array<string>",
    )
    t = fit_unigram_logprob_table(df, dims=8)
    clean = spark.createDataFrame(
        [(0, ["a", "b"]), (1, ["a"])],
        "doc_id: bigint, words: array<string>",
    )
    assert t == fit_unigram_logprob_table(clean, dims=8)


def test_scoring_mappers_skip_null_words(spark):
    """Late r9: one NULL token must not un-score a doc.  Inside a HOF
    lambda, element_at with a NULL index poisons the whole aggregate
    to NULL even under coalesce (the quirk pinned in
    tests/test_selection.py), so both scoring folds filter NULL words
    first — matching the fit's 'NULL words carry no count' contract."""
    from smashed_spark.functions.classifier import (
        LinearQualityClassifierMapper,
        UnigramLogProbMapper,
    )

    dirty = spark.createDataFrame(
        [(0, ["a", None, "b"])], "doc_id: bigint, words: array<string>"
    )
    clean = spark.createDataFrame(
        [(0, ["a", "b"])], "doc_id: bigint, words: array<string>"
    )
    table = [-1.5] * 8

    for mapper in (
        UnigramLogProbMapper(table),
        LinearQualityClassifierMapper([0.3] * 8, bias=0.1),
    ):
        d = mapper.map(dirty).collect()[0]
        c = mapper.map(clean).collect()[0]
        got, want = d[d.__fields__[-1]], c[c.__fields__[-1]]
        assert got is not None
        assert got == want, (mapper, got, want)


def test_bigram_tier_fit_and_score_replay(spark):
    """Late r9: ngram=2 fits/scores consecutive space-joined bigrams —
    the word-order signal a unigram table cannot see.  Python-replayed
    bit-for-bit; <2-word docs have no gram and score NULL."""
    import hashlib
    import math

    from smashed_spark.functions.classifier import (
        UnigramLogProbMapper,
        fit_unigram_logprob_table,
    )

    DIMS = 32

    def bucket(g):
        return int(
            hashlib.md5(g.lower().encode()).hexdigest()[:8], 16
        ) % DIMS

    corpus_words = [
        ["a", "b", "a", "b", "a", "b"],
        ["a", "b", "c"],
        ["solo"],          # no bigram
        ["x", None, "y"],  # NULL removed first: gram ("x","y")? NO —
                           # removal is positional: stream is x,y -> 1 gram
    ]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(corpus_words)],
        "doc_id long, words array<string>",
    )
    table = fit_unigram_logprob_table(df, dims=DIMS, ngram=2)

    grams = []
    for w in corpus_words:
        ws = [x for x in w if x is not None]
        grams += [
            " ".join(ws[i:i + 2]) for i in range(len(ws) - 1)
        ]
    counts = [0] * DIMS
    for g in grams:
        counts[bucket(g)] += 1
    total = sum(counts)
    want = [
        math.log((c + 1.0) / (total + DIMS)) for c in counts
    ]
    assert table == pytest.approx(want)

    scored = {
        r["doc_id"]: r["mean_word_logprob"]
        for r in UnigramLogProbMapper(table, ngram=2).map(df).collect()
    }
    assert scored[2] is None  # one word: no bigram to score
    g0 = ["a b", "b a", "a b", "b a", "a b"]
    assert scored[0] == pytest.approx(
        sum(table[bucket(g)] for g in g0) / len(g0)
    )
    # the point of the tier: in-order prose outscores scrambled text
    # under bigrams (identical unigram profiles)
    probe = spark.createDataFrame(
        [(0, ["a", "b", "a", "b"]), (1, ["b", "b", "a", "a"])],
        "doc_id long, words array<string>",
    )
    p = {
        r["doc_id"]: r["mean_word_logprob"]
        for r in UnigramLogProbMapper(table, ngram=2).map(probe).collect()
    }
    assert p[0] > p[1]
    u_table = fit_unigram_logprob_table(df, dims=DIMS)
    u = {
        r["doc_id"]: r["mean_word_logprob"]
        for r in UnigramLogProbMapper(u_table).map(probe).collect()
    }
    assert u[0] == pytest.approx(u[1])  # unigrams are order-blind

    with pytest.raises(ValueError, match="ngram"):
        fit_unigram_logprob_table(df, dims=DIMS, ngram=0)
    with pytest.raises(ValueError, match="ngram"):
        UnigramLogProbMapper(table, ngram=0)
