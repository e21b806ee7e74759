"""DSIR importance resampling (functions/selection.py): bit-level
python replay of the log-weight fold, Gumbel-top-k determinism +
distributional sanity, plan spies for the narrow/TakeOrdered claims."""

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from smashed_spark.functions.classifier import fit_unigram_logprob_table
from smashed_spark.functions.selection import (
    dsir_select,
    gumbel_top_k,
    with_importance_logweight,
)


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _bucket(word: str, dims: int) -> int:
    return int(hashlib.md5(word.lower().encode()).hexdigest()[:8], 16) % dims


def _py_table(docs, dims, alpha=1.0):
    counts = [0] * dims
    for words in docs:
        for w in words:
            counts[_bucket(w, dims)] += 1
    total = sum(counts)
    return [
        math.log((c + alpha) / (total + alpha * dims)) for c in counts
    ]


def _py_u(doc_id, seed):
    h = int(
        hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:8], 16
    )
    return (h + 0.5) / 2**32


DIMS = 64


def _corpora(spark):
    rng = random.Random(2)
    # target: "science-like" vocab; raw: mixed science + junk
    sci = [f"atom{i}" for i in range(20)]
    junk = [f"buy{i}" for i in range(20)]
    target_rows = [
        (i, [rng.choice(sci) for _ in range(12)]) for i in range(40)
    ]
    raw_rows = [
        (
            100 + i,
            [
                rng.choice(sci if i % 2 == 0 else junk)
                for _ in range(12)
            ],
        )
        for i in range(60)
    ]
    target = spark.createDataFrame(
        target_rows, "doc_id long, words array<string>"
    )
    raw = spark.createDataFrame(
        raw_rows, "doc_id long, words array<string>"
    )
    return target, raw, target_rows, raw_rows


def test_logweight_matches_python_replay(spark):
    target, raw, target_rows, raw_rows = _corpora(spark)
    t_table = fit_unigram_logprob_table(target, dims=DIMS)
    r_table = fit_unigram_logprob_table(raw, dims=DIMS)
    # the spark fit itself replays
    assert t_table == pytest.approx(
        _py_table([w for _, w in target_rows], DIMS)
    )
    out = {
        r["doc_id"]: r["dsir_logw"]
        for r in with_importance_logweight(raw, t_table, r_table).collect()
    }
    for doc_id, words in raw_rows:
        want = sum(
            t_table[_bucket(w, DIMS)] - r_table[_bucket(w, DIMS)]
            for w in words
        )
        assert out[doc_id] == pytest.approx(want, rel=1e-9), doc_id
    # science docs weigh more than junk docs
    sci_w = [v for k, v in out.items() if k % 2 == 0]
    junk_w = [v for k, v in out.items() if k % 2 == 1]
    assert min(sci_w) > max(junk_w)


def test_logweight_empty_and_null_words(spark):
    df = spark.createDataFrame(
        [(1, []), (2, None), (3, ["x", None])],
        "doc_id long, words array<string>",
    )
    t = [-1.0] * 8
    r = [-2.0] * 8
    out = {
        row["doc_id"]: row["dsir_logw"]
        for row in with_importance_logweight(df, t, r).collect()
    }
    assert out[1] == 0.0
    assert out[2] == 0.0
    assert out[3] == pytest.approx(1.0)  # one real word, +1 diff


def test_logweight_validation(spark):
    df = spark.createDataFrame([(1, ["a"])], "doc_id long, words array<string>")
    with pytest.raises(ValueError, match="dims differ"):
        with_importance_logweight(df, [0.0] * 4, [0.0] * 8)


def test_gumbel_replay_and_determinism(spark):
    _, raw, _, raw_rows = _corpora(spark)
    weighted = raw.withColumn(
        "dsir_logw", (F.col("doc_id") % 7).cast("double") / 2.0
    )
    sel = gumbel_top_k(weighted, 10, seed=42, key_field="key")
    got = [(r["doc_id"], r["key"]) for r in sel.collect()]
    # python replay of the exact draw
    keys = {}
    for doc_id, _ in raw_rows:
        u = _py_u(doc_id, 42)
        keys[doc_id] = (doc_id % 7) / 2.0 - math.log(-math.log(u))
    want = sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (d, kg), (_, kw) in zip(got, want):
        assert kg == pytest.approx(kw, rel=1e-12), d
    # partition-layout invariance
    sel2 = gumbel_top_k(
        weighted.repartition(7), 10, seed=42
    )
    assert sorted(r["doc_id"] for r in sel2.collect()) == sorted(
        d for d, _ in got
    )
    # different seed, different sample (with near-certainty)
    sel3 = gumbel_top_k(weighted, 10, seed=43)
    assert sorted(r["doc_id"] for r in sel3.collect()) != sorted(
        d for d, _ in got
    )


def test_gumbel_respects_weights_statistically(spark):
    # one heavy doc vs many light: the heavy one should appear in
    # nearly every k=1 draw across seeds
    rows = [(i, 0.0) for i in range(50)] + [(999, 8.0)]
    df = spark.createDataFrame(rows, "doc_id long, dsir_logw double")
    hits = sum(
        gumbel_top_k(df, 1, seed=s).collect()[0]["doc_id"] == 999
        for s in range(20)
    )
    assert hits >= 18, hits  # exp(8) ~ 3000x the light weight


def test_gumbel_null_guards(spark):
    from pyspark.errors import PySparkRuntimeError, SparkRuntimeException

    df = spark.createDataFrame(
        [(None, 1.0), (2, 1.0)], "doc_id long, dsir_logw double"
    )
    with pytest.raises((PySparkRuntimeError, SparkRuntimeException)):
        gumbel_top_k(df, 1).collect()
    df2 = spark.createDataFrame(
        [(1, None), (2, 1.0)], "doc_id long, dsir_logw double"
    )
    with pytest.raises((PySparkRuntimeError, SparkRuntimeException)):
        gumbel_top_k(df2, 1).collect()
    with pytest.raises(ValueError, match="k must be"):
        gumbel_top_k(df, 0)


def test_gumbel_duplicate_winner_raises(spark):
    """Duplicate ids share Gumbel noise; when both copies land in the
    top-k the in-plan lag guard raises instead of silently returning
    the same document twice (with-replacement)."""
    from pyspark.errors import PySparkRuntimeError, SparkRuntimeException

    rows = [(1, 50.0), (1, 50.0)] + [(i, 0.0) for i in range(2, 12)]
    df = spark.createDataFrame(rows, "doc_id long, dsir_logw double")
    with pytest.raises(
        (PySparkRuntimeError, SparkRuntimeException), match="duplicate"
    ):
        gumbel_top_k(df, 2).collect()
    # k=1: only one copy can win — valid distinct output, no raise
    # (full-corpus uniqueness stays the documented caller contract;
    # enforcing it would cost a full pre-top-k exchange)
    out = gumbel_top_k(df, 1).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 1


def test_plan_narrow_weight_takeordered_sample(spark):
    _, raw, _, _ = _corpora(spark)
    t = [0.1] * DIMS
    r = [0.2] * DIMS
    weighted = with_importance_logweight(raw, t, r)
    plan_w = _explain(weighted)
    assert "Exchange" not in plan_w, plan_w  # scan-speed fold
    plan_k = _explain(gumbel_top_k(weighted, 5))
    assert "TakeOrderedAndProject" in plan_k, plan_k
    assert "Exchange" not in plan_k, plan_k  # k-row driver merge only


def test_dsir_select_end_to_end(spark):
    target, raw, _, _ = _corpora(spark)
    sel = dsir_select(raw, target, 12, dims=DIMS, seed=7)
    rows = sel.collect()
    assert len(rows) == 12
    ids = [r["doc_id"] for r in rows]
    # mostly science docs (even ids): the target pull is strong here
    assert sum(1 for i in ids if i % 2 == 0) >= 10, ids
    assert "dsir_logw" in sel.columns


def test_hof_null_index_poisoning_quirk_is_real(spark):
    """Pins the Spark behavior the NULL-word filters exist for: inside
    a higher-order-function lambda, element_at with a NULL index
    returns NULL for the WHOLE aggregate even when the term is wrapped
    in coalesce.  If a future Spark fixes this, this test fails and
    the filters in selection.py / classifier.py become optional."""
    darr = F.array(*[F.lit(1.0)] * 4)
    df = spark.createDataFrame(
        [(1, ["x", None])], "doc_id long, words array<string>"
    )
    out = df.select(
        F.aggregate(
            "words",
            F.lit(0.0),
            lambda acc, w: acc
            + F.coalesce(
                F.element_at(darr, F.when(w.isNotNull(), F.lit(2))),
                F.lit(0.0),
            ),
        ).alias("g")
    ).collect()[0]["g"]
    assert out is None, (
        "Spark fixed the HOF NULL-index poisoning quirk — the NULL-word"
        " filters in selection/classifier are now optional (got %r)"
        % out
    )


def test_dsir_bigram_features(spark):
    """ngram=2 DSIR: a target defined by word ORDER (ab-prose) is
    invisible to unigram weights but separable with bigram features."""
    rows_ab = [(i, ["a", "b"] * 6) for i in range(20)]        # ordered
    rows_sh = [(100 + i, ["b"] * 6 + ["a"] * 6) for i in range(20)]
    raw = spark.createDataFrame(
        rows_ab + rows_sh, "doc_id long, words array<string>"
    )
    target = spark.createDataFrame(
        rows_ab, "doc_id long, words array<string>"
    )
    uni = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_select(
            raw, target, 40, dims=32, seed=3, ngram=1
        ).collect()
    }
    # unigram weights cannot separate the groups (same bag of words)
    assert max(
        abs(uni[i] - uni[100 + i]) for i in range(20)
    ) < 1e-9
    bi = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_select(
            raw, target, 40, dims=32, seed=3, ngram=2
        ).collect()
    }
    assert min(bi[i] for i in range(20)) > max(
        bi[100 + i] for i in range(20)
    )


# ---------------------------------------------------------------------------
# D4-style diversity selection (with_prototypicality / diversity_select)
# ---------------------------------------------------------------------------

import numpy as np

from smashed_spark.functions.selection import (  # noqa: E402
    diversity_select,
    with_prototypicality,
)

# two well-separated unit directions in 4d + noise — cluster membership
# is unambiguous, so the python replay never depends on kmeans luck
_DSEL_CENTS = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]


def _dsel_rows():
    rng = random.Random(7)
    rows = []
    for i in range(30):
        axis = i % 2
        v = [rng.uniform(-0.08, 0.08) for _ in range(4)]
        v[axis] += 1.0 + 0.5 * rng.random()
        rows.append((i, v))
    # a zero-norm straggler: must land in cell 0 with cosine 0.0
    rows.append((99, [0.0, 0.0, 0.0, 0.0]))
    return rows


def _py_proto(rows, cents):
    cents = np.asarray(cents, dtype=np.float64)
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    out = {}
    for i, v in rows:
        u = np.asarray(v, dtype=np.float64)
        u /= max(np.linalg.norm(u), 1e-12)
        sims = cents @ u
        cell = int(np.argmax(sims))
        out[i] = (cell, float(sims[cell]))
    return out


def _py_diversity(rows, cents, keep_fraction=None, per_cell=None,
                  keep="diverse"):
    proto = _py_proto(rows, cents)
    by_cell = {}
    for i, (cell, cos) in proto.items():
        by_cell.setdefault(cell, []).append((cos, i))
    kept = set()
    for cell, members in by_cell.items():
        members.sort(key=lambda t: (t[0], t[1]))
        if keep == "prototypical":
            members.sort(key=lambda t: (-t[0], t[1]))
        # mirrors the _K_EPS convention: ceil over the epsilon-nudged
        # IEEE product (0.1 * 30 lands one ulp above 3.0; exact
        # arithmetic keeps 3, not 4)
        cap = (
            per_cell
            if per_cell is not None
            else max(1, math.ceil(keep_fraction * len(members) - 1e-9))
        )
        kept.update(i for _, i in members[:cap])
    return kept, proto


def test_prototypicality_matches_python_replay(spark):
    rows = _dsel_rows()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        r["vec_id"]: (r["cell"], r["proto_cos"])
        for r in with_prototypicality(df, _DSEL_CENTS).collect()
    }
    want = _py_proto(rows, _DSEL_CENTS)
    assert got.keys() == want.keys()
    for i in got:
        assert got[i][0] == want[i][0], i
        assert abs(got[i][1] - want[i][1]) < 1e-12, i
    # the zero-norm straggler: cell 0, cosine exactly 0.0
    assert got[99] == (0, 0.0)


def test_diversity_select_fraction_matches_replay(spark):
    rows = _dsel_rows()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    for keep in ("diverse", "prototypical"):
        out = diversity_select(
            df, _DSEL_CENTS, keep_fraction=0.25, keep=keep
        )
        got = {r["vec_id"] for r in out.collect()}
        want, _ = _py_diversity(
            rows, _DSEL_CENTS, keep_fraction=0.25, keep=keep
        )
        assert got == want, keep
    # diverse and prototypical pick from opposite ends of each cell
    div, proto = _py_diversity(rows, _DSEL_CENTS, keep_fraction=0.25)
    prot, _ = _py_diversity(
        rows, _DSEL_CENTS, keep_fraction=0.25, keep="prototypical"
    )
    assert div != prot


def test_diversity_select_per_cell_cap_and_plan(spark):
    rows = _dsel_rows()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = diversity_select(
        df, _DSEL_CENTS, per_cell=3, rank_field="rank"
    )
    got = out.collect()
    want, _ = _py_diversity(rows, _DSEL_CENTS, per_cell=3)
    assert {r["vec_id"] for r in got} == want
    per = {}
    for r in got:
        per[r["cell"]] = per.get(r["cell"], 0) + 1
        assert 1 <= r["rank"] <= 3
    assert all(v <= 3 for v in per.values())
    # literal rank filter compiles to WindowGroupLimit (pre-shuffle
    # per-partition top-n) and the whole selection is ONE exchange
    # (after collect, AQE echoes the pre-adaptive plan under an
    # "Initial Plan" banner — count only the final plan)
    tree = (
        _explain(out).split("\n\n")[0].split("== Initial Plan ==")[0]
    )
    assert "WindowGroupLimit" in tree, tree
    assert tree.count("Exchange (") == 1, tree


def test_diversity_select_fraction_single_exchange(spark):
    rows = _dsel_rows()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = diversity_select(df, _DSEL_CENTS, keep_fraction=0.5)
    # the count window rides the rank window's exchange — still one
    tree = _explain(out).split("\n\n")[0]
    assert tree.count("Exchange (") == 1, tree


def test_diversity_fraction_ulp_epsilon(spark):
    """0.07 * 100 evaluates one IEEE ulp ABOVE 7.0 (7.000000000000001)
    — a raw ceil keeps 8 rows where exact arithmetic keeps 7.  Pins
    the _K_EPS-style epsilon in the keep_fraction branch (ADVICE r9)."""
    assert 0.07 * 100 > 7.0  # the premise: the product is above the int
    rng = random.Random(11)
    rows = []
    for i in range(100):  # all 100 land in cell 0
        v = [rng.uniform(-0.05, 0.05) for _ in range(4)]
        v[0] += 1.0
        rows.append((i, v))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = diversity_select(df, _DSEL_CENTS, keep_fraction=0.07)
    assert out.count() == 7
    # tiny fraction: greatest(1, ...) keeps one doc per non-empty cell
    out1 = diversity_select(df, _DSEL_CENTS, keep_fraction=1e-12)
    assert out1.count() == 1


def test_diversity_select_validation(spark):
    df = spark.createDataFrame([(1, [1.0, 0.0, 0.0, 0.0])],
                               ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="exactly one"):
        diversity_select(df, _DSEL_CENTS)
    with pytest.raises(ValueError, match="exactly one"):
        diversity_select(df, _DSEL_CENTS, keep_fraction=0.5, per_cell=2)
    with pytest.raises(ValueError, match="keep_fraction"):
        diversity_select(df, _DSEL_CENTS, keep_fraction=1.5)
    with pytest.raises(ValueError, match="per_cell"):
        diversity_select(df, _DSEL_CENTS, per_cell=0)
    with pytest.raises(ValueError, match="keep must be"):
        diversity_select(df, _DSEL_CENTS, keep_fraction=0.5, keep="best")
    with pytest.raises(ValueError, match="already exists"):
        with_prototypicality(
            df.withColumn("cell", F.lit(1)), _DSEL_CENTS
        )


def test_prototypicality_dims_mismatch_actionable(spark):
    df = spark.createDataFrame([(1, [1.0, 0.0])], ["vec_id", "embedding"])
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.base import PySparkException

    with pytest.raises((Py4JJavaError, PySparkException, Exception)) as ei:
        with_prototypicality(df, _DSEL_CENTS).collect()
    assert "different embedding space" in str(ei.value)


# ---------------------------------------------------------------------------
# dsir_select driver-budget routing (slim path)
# ---------------------------------------------------------------------------


def test_dsir_select_slim_matches_direct(spark):
    """The slim path (gumbel on a (id, logw) projection + broadcast
    semi-join back) selects the SAME winner set with the SAME weights
    as the direct path — the draw is a pure function of (id, weight,
    seed).  Row order is not part of the contract."""
    target, raw, _, _ = _corpora(spark)
    direct = dsir_select(raw, target, 12, dims=DIMS, seed=7)
    slimmed = dsir_select(raw, target, 12, dims=DIMS, seed=7, slim=True)
    d_rows = direct.collect()
    s_rows = slimmed.collect()
    assert sorted(r["doc_id"] for r in s_rows) == sorted(
        r["doc_id"] for r in d_rows
    )
    assert set(slimmed.columns) == set(direct.columns)
    dmap = {r["doc_id"]: r["dsir_logw"] for r in d_rows}
    for r in s_rows:
        assert r["dsir_logw"] == dmap[r["doc_id"]]


def test_dsir_select_auto_budget_routing_plan_spy(spark):
    """slim=None routes on k x estimated row width vs the driver
    budget.  Over budget: the TakeOrderedAndProject node must hold
    ONLY the slim (id, logw, key) columns — the full-width frame never
    enters the driver merge — and the join-back is a broadcast
    LeftSemi.  Under budget (gate-sized k): direct TakeOrdered, no
    semi-join."""
    target, raw, _, _ = _corpora(spark)
    plan = _explain(
        dsir_select(
            raw, target, 12, dims=DIMS, seed=7, driver_budget_bytes=1
        )
    )
    assert "LeftSemi" in plan, plan
    assert "words" in plan  # probe side still reads the corpus
    tol_blocks = [
        b for b in plan.split("\n\n") if "TakeOrderedAndProject" in b
    ]
    assert tol_blocks, plan
    for b in tol_blocks:
        assert "words" not in b, b  # slim rows only in the merge
    plan2 = _explain(dsir_select(raw, target, 12, dims=DIMS, seed=7))
    assert "LeftSemi" not in plan2, plan2
    assert "TakeOrderedAndProject" in plan2, plan2


def test_estimated_row_bytes_heuristic():
    from pyspark.sql import types as T

    from smashed_spark.functions.selection import _estimated_row_bytes

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("words", T.ArrayType(T.StringType())),
            T.StructField("w", T.DoubleType()),
        ]
    )
    # 8 + 64*64 + 8 — pessimistic container sizing, documented
    assert _estimated_row_bytes(schema) == 8 + 64 * 64 + 8


def test_duplicate_winner_guard_survives_id_only_projection(spark):
    """The guard wraps id_field as well as weight_field, so a
    projection that keeps only the ids (the slim path's semi-join
    shape) cannot prune it."""
    from pyspark.errors import PySparkRuntimeError, SparkRuntimeException

    rows = [(1, 50.0), (1, 50.0)] + [(i, 0.0) for i in range(2, 12)]
    df = spark.createDataFrame(rows, "doc_id long, dsir_logw double")
    with pytest.raises(
        (PySparkRuntimeError, SparkRuntimeException), match="duplicate"
    ):
        gumbel_top_k(df, 2).select("doc_id").collect()


# ---------------------------------------------------------------------------
# gumbel_top_k_grouped (stratified draw)
# ---------------------------------------------------------------------------

from smashed_spark.functions.selection import (  # noqa: E402
    gumbel_top_k_grouped,
)


def _grouped_frame(spark):
    # three sources of different sizes and weight profiles
    rows = []
    for i in range(30):
        rows.append((i, "big", float(i % 5)))
    for i in range(100, 108):
        rows.append((i, "small", 2.0))
    rows.append((200, "tiny", 0.0))
    return spark.createDataFrame(
        rows, "doc_id long, source string, dsir_logw double"
    )


def test_grouped_gumbel_quota_and_python_replay(spark):
    df = _grouped_frame(spark)
    out = gumbel_top_k_grouped(
        df, 4, "source", seed=5, key_field="key"
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # every group filled to min(k, group size)
    assert len(by_src["big"]) == 4
    assert len(by_src["small"]) == 4
    assert len(by_src["tiny"]) == 1
    # bit-level python replay of the within-group ranking
    import math as m

    def key_of(doc_id, logw):
        return logw - m.log(-m.log(_py_u(doc_id, 5)))

    want = {}
    for doc_id, src, logw in [
        (r["doc_id"], r["source"], r["dsir_logw"])
        for r in _grouped_frame(spark).collect()
    ]:
        want.setdefault(src, []).append((key_of(doc_id, logw), doc_id))
    for src, items in want.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        want[src] = sorted(d for _, d in items[:4])
    got = {s: sorted(r["doc_id"] for r in rs) for s, rs in by_src.items()}
    assert got == want
    for r in out:
        assert r["key"] == pytest.approx(
            key_of(r["doc_id"], r["dsir_logw"]), rel=1e-12
        )


def test_grouped_gumbel_partition_invariance_and_null_group(spark):
    df = _grouped_frame(spark).unionByName(
        _grouped_frame(spark).limit(0)
    )
    a = sorted(
        (r["source"], r["doc_id"])
        for r in gumbel_top_k_grouped(df, 3, "source").collect()
    )
    b = sorted(
        (r["source"], r["doc_id"])
        for r in gumbel_top_k_grouped(
            df.repartition(7), 3, "source"
        ).collect()
    )
    assert a == b
    # NULL group key forms its own group (no row escapes the quota)
    df2 = df.withColumn(
        "source",
        F.when(F.col("doc_id") < 3, F.lit(None)).otherwise("x"),
    )
    out = gumbel_top_k_grouped(df2, 2, "source").collect()
    null_rows = [r for r in out if r["source"] is None]
    assert len(null_rows) == 2


def test_grouped_gumbel_single_group_matches_global(spark):
    df = _grouped_frame(spark).withColumn("g", F.lit("all"))
    grouped = sorted(
        r["doc_id"] for r in gumbel_top_k_grouped(df, 6, "g", seed=9).collect()
    )
    global_ = sorted(
        r["doc_id"] for r in gumbel_top_k(df, 6, seed=9).collect()
    )
    assert grouped == global_


def test_grouped_gumbel_plan_windowgrouplimit(spark):
    df = _grouped_frame(spark)
    plan = _explain(gumbel_top_k_grouped(df, 3, "source"))
    assert "WindowGroupLimit" in plan, plan
    assert plan.count("Exchange") <= 2, plan  # one logical exchange
    # (AQE may print shuffle read stages; the write side is single)


def test_grouped_gumbel_validation_and_guards(spark):
    from pyspark.errors import PySparkRuntimeError, SparkRuntimeException

    df = _grouped_frame(spark)
    with pytest.raises(ValueError, match="k must be"):
        gumbel_top_k_grouped(df, 0, "source")
    with pytest.raises(ValueError, match="at least one column"):
        gumbel_top_k_grouped(df, 1, [])
    bad = spark.createDataFrame(
        [(None, "s", 1.0), (2, "s", 1.0)],
        "doc_id long, source string, dsir_logw double",
    )
    with pytest.raises((PySparkRuntimeError, SparkRuntimeException)):
        gumbel_top_k_grouped(bad, 1, "source").collect()
    bad2 = spark.createDataFrame(
        [(1, "s", None), (2, "s", 1.0)],
        "doc_id long, source string, dsir_logw double",
    )
    with pytest.raises((PySparkRuntimeError, SparkRuntimeException)):
        gumbel_top_k_grouped(bad2, 1, "source").collect()


def test_dsir_select_sampled_width_routes_long_text_slim(spark):
    """Code review r11: static schema widths are blind to a 500 KB
    page in a plain string column; the bounded sampled width must
    route such a corpus SLIM under a budget the static floor alone
    would pass."""
    import random

    rng = random.Random(3)
    big = " ".join(
        "".join(rng.choice("abcdefgh") for _ in range(8))
        for _ in range(4000)
    )  # ~36 KB of text per doc
    rows = [(i, (big + f" tail{i}").split(" ")) for i in range(30)]
    raw = spark.createDataFrame(rows, "doc_id long, words array<string>")
    target = raw.limit(10)
    # static floor: 8 + 64*64 + 8 ~ 4.1 KB/row -> k=20 x 4.1 KB ~ 83 KB
    # under a 512 KB budget -> static-only would go DIRECT; the
    # sampled width (~44 KB/row serialized) makes k x est ~ 880 KB ->
    # over budget -> SLIM
    plan = _explain(
        dsir_select(
            raw, target, 20, dims=32, seed=1,
            driver_budget_bytes=512 << 10,
        )
    )
    assert "LeftSemi" in plan, plan[:2000]
