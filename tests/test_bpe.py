"""Learned BPE (functions/bpe.py): classic-algorithm hand-checked
merges, deterministic fit, Arrow-narrow encoding."""

import pytest
from pyspark.sql import functions as F

from smashed_spark.functions.bpe import (
    BpeTokenCountMapper,
    bpe_encode_word,
    fit_bpe_merges,
)


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(i, r.split()) for i, r in enumerate(rows)],
        "doc_id long, words array<string>",
    )


def test_fit_matches_hand_run_sennrich(spark):
    """The textbook example: {'aaab': 3, 'aab': 2} word types.  Pair
    counts round 1: (a,a)=3+3+2=8 wait — hand-derive precisely below:
    'aaab'x3 -> a a a b </w>; 'aab'x2 -> a a b </w>.
    round1: (a,a)=3*2+2*1=8, (a,b)=5, (b,</w>)=5 -> merge (a,a)
    round2: 'aa a b </w>'x3: (aa,a)=3,(a,b)=3,(b,</w>)=5... plus
    'aa b </w>'x2: (aa,b)=2 -> (b,</w>)=5 wins
    round3: (aa,a)=3,(a,b</w>)=3,(aa,b</w>)=2 -> tie 3 ->
    lexicographically smallest pair: ('a','b</w>')."""
    df = _corpus(spark, ["aaab aaab aaab aab aab"])
    merges = fit_bpe_merges(df, num_merges=3)
    assert merges == [("a", "a"), ("b", "</w>"), ("a", "b</w>")]
    ranks = {m: i for i, m in enumerate(merges)}
    assert bpe_encode_word("aaab", ranks) == ["aa", "ab</w>"]
    assert bpe_encode_word("aab", ranks) == ["aa", "b</w>"]
    assert bpe_encode_word("zzz", ranks) == ["z", "z", "z", "</w>"]


def test_fit_is_partition_invariant_and_stops(spark):
    rows = ["low low low lower lower lowest"] * 4
    a = fit_bpe_merges(_corpus(spark, rows), num_merges=50)
    b = fit_bpe_merges(
        _corpus(spark, rows).repartition(7), num_merges=50
    )
    assert a == b
    # stops before memorizing singletons: asked for 50, got fewer
    assert 0 < len(a) < 50


def test_count_mapper_matches_encode(spark):
    rows = ["low lower lowest", "low low"]
    df = _corpus(spark, rows)
    merges = fit_bpe_merges(df, num_merges=10)
    ranks = {m: i for i, m in enumerate(merges)}
    out = {
        r["doc_id"]: r["n_bpe_tokens_learned"]
        for r in BpeTokenCountMapper(merges).map(df).collect()
    }
    for i, r in enumerate(rows):
        want = sum(len(bpe_encode_word(w, ranks)) for w in r.split())
        assert out[i] == want, (i, out[i], want)
    # tokens_field mode agrees with the count
    tok = (
        BpeTokenCountMapper(merges, tokens_field="toks")
        .map(df)
        .collect()
    )
    for r in tok:
        assert len(r["toks"]) == r["n_bpe_tokens_learned"]


def test_null_words_and_plan(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ["x"])], "doc_id long, words array<string>"
    )
    merges = [("a", "b")]
    out = {
        r["doc_id"]: r["n_bpe_tokens_learned"]
        for r in BpeTokenCountMapper(merges).map(df).collect()
    }
    assert out[1] is None
    assert out[2] == 2  # 'x' + '</w>' fallback
    plan = _explain(BpeTokenCountMapper(merges).map(df))
    assert "ArrowEvalPython" in plan, plan
    assert "Exchange" not in plan, plan
    with pytest.raises(ValueError, match="merges"):
        BpeTokenCountMapper([])
    with pytest.raises(ValueError, match="num_merges"):
        fit_bpe_merges(df, num_merges=0)


def test_budget_integration(spark):
    """The point of the learned counts: budget selection on real BPE
    numbers composes unchanged."""
    from smashed_spark.sources.loaders import select_under_token_budget

    df = _corpus(
        spark, ["low lower", "lowest lowest lowest", "low", "wide new"]
    ).withColumn("score", F.col("doc_id").cast("double"))
    merges = fit_bpe_merges(df, num_merges=8)
    counted = BpeTokenCountMapper(merges).map(df)
    picked = select_under_token_budget(
        counted, 10, tokens_field="n_bpe_tokens_learned",
        score_field="score", key_field="doc_id", drop=True,
    )
    rows = picked.collect()
    assert sum(r["n_bpe_tokens_learned"] for r in rows) <= 10
    assert len(rows) >= 1


def _fit_replay(docs, num_merges, max_word_types=50_000):
    """From-scratch recount reference fit (the textbook formulation the
    incremental heap+inverted-index loop must match bit-for-bit):
    full pair recount every merge, same selection rule (max count,
    lexicographically smallest pair on ties), same <2 stop."""
    from collections import Counter

    cnt = Counter()
    for words in docs:
        for w in words:
            if w:
                cnt[w] += 1
    items = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    items = items[:max_word_types]
    vocab = [(list(w) + ["</w>"], c) for w, c in items]
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for symbols, c in vocab:
            for i in range(len(symbols) - 1):
                p = (symbols[i], symbols[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        merged = a + b
        for symbols, _ in vocab:
            i = 0
            while i < len(symbols) - 1:
                if symbols[i] == a and symbols[i + 1] == b:
                    symbols[i:i + 2] = [merged]
                else:
                    i += 1
    return merges


def test_incremental_fit_matches_from_scratch_replay(spark):
    """The incremental pair-count loop is an optimization, not a new
    algorithm: on a deep random corpus (small alphabet so merges chain
    far) the merges must equal the from-scratch recount exactly."""
    import random

    rng = random.Random(11)
    docs = [
        [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 7)))
            for _ in range(rng.randint(3, 15))
        ]
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, words array<string>"
    )
    got = fit_bpe_merges(df, num_merges=120)
    want = _fit_replay(docs, 120)
    assert got == want
    assert len(got) > 30  # the corpus actually supports deep merging


def test_incremental_fit_matches_replay_with_type_cap(spark):
    """max_word_types truncation happens BEFORE the merge loop; the
    incremental loop must match the replay under the same cap."""
    import random

    rng = random.Random(5)
    docs = [
        [
            "".join(rng.choice("xy") for _ in range(rng.randint(2, 6)))
            for _ in range(8)
        ]
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, words array<string>"
    )
    got = fit_bpe_merges(df, num_merges=40, max_word_types=12)
    want = _fit_replay(docs, 40, max_word_types=12)
    assert got == want


# ---------------------------------------------------------------------------
# r13: merge-table persistence (save_bpe_merges / load_bpe_merges)
# ---------------------------------------------------------------------------


def test_save_load_roundtrip_and_encode_parity(spark, tmp_path):
    from smashed_spark.functions.bpe import (
        bpe_ranks,
        bpe_vocab,
        load_bpe_merges,
        save_bpe_merges,
    )

    corpus = _corpus(
        spark,
        ["low low low lower lowest", "new newer newest low", "wide wider"],
    )
    merges = fit_bpe_merges(corpus, num_merges=24)
    assert merges  # non-trivial table
    base = sorted({c for r in ["low lower lowest new"] for c in r if c != " "})
    path = str(tmp_path / "bpe")
    save_bpe_merges(merges, path, base_chars=base)
    loaded = load_bpe_merges(path)
    assert loaded == merges
    # encode parity: identical tokens for every word through the
    # loaded table
    ranks_a, ranks_b = bpe_ranks(merges), bpe_ranks(loaded)
    for w in ["low", "lowest", "newer", "unseen", "wide", ""]:
        assert bpe_encode_word(w, ranks_a) == bpe_encode_word(w, ranks_b)
    # vocab export: base chars first (sorted), then eow, then merged
    # symbols in rank order, deduped
    import json

    vocab = json.loads(open(path + "/vocab.json").read())
    assert vocab == bpe_vocab(merges, base_chars=base)
    assert vocab[: len(base)] == base
    assert "</w>" in vocab
    assert len(vocab) == len(set(vocab))


def test_save_load_weird_symbols_and_version_refusals(tmp_path):
    """JSON format survives symbols a space-separated merges.txt
    cannot (spaces can't occur, but newlines/quotes/unicode can)."""
    import json

    from smashed_spark.functions.bpe import (
        load_bpe_merges,
        save_bpe_merges,
    )

    merges = [("a", "é"), ('"', "b"), ("\t", "c</w>")]
    path = str(tmp_path / "bpe")
    save_bpe_merges(merges, path)
    assert load_bpe_merges(path) == merges

    bad = json.loads(open(path + "/merges.json").read())
    bad["format_version"] = 99
    open(path + "/merges.json", "w").write(json.dumps(bad))
    with pytest.raises(ValueError, match="format_version"):
        load_bpe_merges(path)
    bad["format_version"] = 1
    bad["eow"] = "##"
    open(path + "/merges.json", "w").write(json.dumps(bad))
    with pytest.raises(ValueError, match="end-of-word"):
        load_bpe_merges(path)


def test_save_load_s3_tier(spark, tmp_path):
    boto3 = pytest.importorskip("boto3")
    moto = pytest.importorskip("moto")

    from smashed_spark.functions.bpe import (
        bpe_ranks,
        load_bpe_merges,
        save_bpe_merges,
    )
    from smashed_spark.sources import io_utils

    corpus = _corpus(spark, ["ab ab abc abcd", "ab abc xyz"])
    merges = fit_bpe_merges(corpus, num_merges=8)
    with moto.mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket="bpebucket")
        # io_utils helpers take client=..., but save/load build their
        # own default client — patch the factory the way test_s3_io
        # does for client-less call sites
        orig = io_utils._client
        io_utils._client = lambda **kw: client
        try:
            save_bpe_merges(merges, "s3://bpebucket/tok/v1")
            loaded = load_bpe_merges("s3://bpebucket/tok/v1")
        finally:
            io_utils._client = orig
    assert loaded == merges
    ranks = bpe_ranks(loaded)
    assert bpe_encode_word("abcd", ranks) == bpe_encode_word(
        "abcd", bpe_ranks(merges)
    )
