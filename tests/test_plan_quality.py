"""Physical-plan quality gates: these assert the plans we *want* at
100 TB, not just correct answers — filter pushdown into the parquet
scan, column pruning, broadcast joins for dimensions, map-side partial
aggregation, and no Python in native-operator plans.
"""

import glob
import os
import sys

import pytest
from pyspark.sql import functions as F

from smashed_spark.operators.fields import ChangeFieldsMapper
from smashed_spark.operators.filters import FilterMapper
from smashed_spark.plans.registry import load


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _count_widen_exchanges(plan: str) -> int:
    """Count Exchange nodes whose Arguments line carries
    RoundRobinPartitioning — STRUCTURALLY, from the formatted plan's
    detail blocks, instead of subtracting raw substring counts (r17,
    ADVICE: a ReusedExchange of a widen node, or any other plan text
    mentioning RoundRobinPartitioning, would skew the naive
    arithmetic)."""
    n = 0
    for block in plan.split("\n\n"):
        lines = block.strip().splitlines()
        if not lines:
            continue
        head = lines[0]
        if ") Exchange" in head and any(
            ln.startswith("Arguments:") and "RoundRobinPartitioning" in ln
            for ln in lines[1:]
        ):
            n += 1
    return n


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = load(spark, sf_dir, "documents")
    out = FilterMapper("n_chars", ">=", 100).map(df)
    plan = _explain(out)
    assert "PushedFilters: [IsNotNull(n_chars), GreaterThanOrEqual(n_chars,100)" in plan, plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = load(spark, sf_dir, "documents")
    out = ChangeFieldsMapper(keep_fields=["doc_id", "lang"]).map(df)
    plan = _explain(out)
    # ReadSchema must not include the wide text column
    assert "text" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_pipeline_fuses_into_one_projection(spark, sf_dir):
    # N chained row-local mappers must not stack N projections
    from smashed_spark.operators.debug import MockMapper

    df = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    pipe = MockMapper(1) >> MockMapper(2) >> MockMapper(3) >> MockMapper(4)
    plan = _explain(pipe.map(df))
    assert plan.count("Project") <= 2, plan


def test_dimension_join_broadcasts(spark, sf_dir):
    from smashed_spark.plans.queries_scale import q_revenue_nation

    plan = _explain(q_revenue_nation(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_agg_has_partial_phase(spark, sf_dir):
    from smashed_spark.plans.queries_scale import q_pricing

    plan = _explain(q_pricing(spark, sf_dir))
    # two HashAggregate nodes = map-side partial + final
    assert plan.count("HashAggregate") >= 2


def test_native_pipeline_has_no_python(spark, sf_dir):
    from smashed_spark.plans.queries import q_flagship

    plan = _explain(q_flagship(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_exact_dedup_single_shuffle(spark, sf_dir):
    from smashed_spark.functions.dedup import ExactDedupMapper

    out = ExactDedupMapper().map(load(spark, sf_dir, "documents"))
    plan = _explain(out)
    # "Exchange (n)" appears once per node in the tree section.
    # One shuffle keyed on the digest is the floor for global dedup;
    # the aggregate is sort-based (struct-typed min_by buffer), which
    # beats the agg+join-back alternative's extra shuffle.
    assert plan.count("Exchange (") == 1, plan


def test_wholestage_codegen_covers_flagship(spark, sf_dir):
    from smashed_spark.plans.queries import q_flagship

    # the '*' node prefix marks whole-stage-codegen'd operators in
    # formatted explain output
    plan = _explain(q_flagship(spark, sf_dir))
    assert "* Filter" in plan and "* Project" in plan, plan


def _jobs_submitted(spark) -> int:
    # the DAGScheduler's job counter: how many jobs have been submitted
    # in this session so far
    return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()


def test_ann_plan_construction_runs_no_jobs(spark, sf_dir):
    """Strategy selection + plan building must be pure plan-time work:
    the VERDICT-flagged df.count()/limit(1).collect() probes are gone
    — building any ANN/near-dup plan with dims pinned submits zero
    Spark jobs before the terminal action."""
    from smashed_spark.functions.dedup import EmbeddingNearDupPairsMapper
    from smashed_spark.functions.similarity import (
        CosineTopK,
        HyperplaneLSHTopK,
    )

    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    before = _jobs_submitted(spark)
    CosineTopK(k=5, queries_filter="vec_id < 20", strategy="exact_join").map(df)
    EmbeddingNearDupPairsMapper(threshold=0.35, dims=64, strategy="lsh").map(df)
    HyperplaneLSHTopK(k=5, num_bits=6, num_tables=4, dims=64).map(df)
    # auto strategy reads Catalyst stats only — still no job (the
    # broadcast tier would legitimately collect at build time, so pin
    # the estimate below the corpus to route auto -> lsh)
    import pytest

    auto = EmbeddingNearDupPairsMapper(threshold=0.35, dims=64)
    auto.BROADCAST_LIMIT_BYTES = 0
    with pytest.warns(UserWarning, match="approximate LSH"):
        auto.map(df)
    assert _jobs_submitted(spark) == before


def test_fewshot_single_exchange_single_python_stage(spark, sf_dir):
    """FewShotJinjaMapper (contiguous-key path): one hash exchange on
    the group id, groups folded JVM-side by collect_list, bulk
    MapInPandas renders — NOT one Python call per group
    (FlatMapGroupsInPandas).  The r5 composite gate chains JinjaMapper
    before the fewshot pack, so exactly TWO MapInPandas stages (one
    per render), still one exchange."""
    from smashed_spark.plans.queries import q_fewshot

    plan = _explain(q_fewshot(spark, sf_dir))
    assert "FlatMapGroupsInPandas" not in plan, plan
    # "<Node> (n)" matches the tree section only (details render as
    # "(n) <Node>"), so these count physical nodes exactly once
    assert plan.count("MapInPandas (") == 2, plan
    assert plan.count("Exchange (") == 1, plan
    assert "Sort (" not in plan, plan  # no global sort on the scale path


def test_simhash_pairs_no_cartesian_bounded_exchanges(spark, sf_dir):
    """The full simhash near-dup gate composition (signature -> banded
    pairs) must stay a banded equi-join: no cartesian/nested-loop node,
    and at most 3 shuffle exchanges (left band key + right band key +
    the final pair dedup; broadcast exchanges excluded — a broadcast
    plan replicates the slim banded side instead of shuffling it).
    The occupancy guard's window partitions on exactly the join keys,
    so it must NOT add an exchange beyond those.  The bit_count
    Hamming verify must sit below the dedup exchange in the tree
    (map-side, before the shuffle), not above it."""
    import re
    from smashed_spark.functions.dedup import (
        SimHashMapper,
        SimHashNearDupPairsMapper,
    )

    df = load(spark, sf_dir, "documents").withColumn(
        "words", F.split("text", " ")
    )
    pipe = SimHashMapper(bits=32) >> SimHashNearDupPairsMapper(
        "doc_id", bits=32, max_hamming=3
    )
    plan = _explain(pipe.map(df))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert len(re.findall(r"(?<!Broadcast)Exchange \(", plan)) <= 3, plan
    # tree prints root-first, so deeper (earlier-executed) nodes appear
    # later in the text: the verify filter must print after the dedup
    # exchange -> it executes before the shuffle
    tree = plan.split("===== Subqueries")[0]
    first_exchange = tree.index("Exchange (")
    verify_filter = tree.index("bit_count")
    assert verify_filter > first_exchange, plan


def test_stream_sessionize_single_exchange(spark, sf_dir, tmp_path):
    """Streaming sessionization: one hash exchange on the user key into
    a single FlatMapGroupsInPandasWithState stage — O(users) state, no
    extra shuffle, no per-event Python stage."""
    from smashed_spark.streaming.stateful import streaming_sessionize

    events = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .limit(200)
    )
    src = str(tmp_path / "events")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    sessions = streaming_sessionize(
        stream, gap_minutes=30, idle_timeout=False
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("plan_probe_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        plan = q._jsq.explainInternal(False)
    finally:
        q.stop()
        spark.catalog.dropTempView("plan_probe_sessions")
    assert "FlatMapGroupsInPandasWithState" in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_text_stats_exchange_budget(spark, sf_dir):
    """text_stats family: the narrow analysis mappers add ZERO
    exchanges; the repetition block is bounded at 3 (gram-key agg,
    doc-key agg, join-back), each with a map-side partial phase
    (4 HashAggregate nodes = 2 aggs x partial+final).  The r9
    calibration fold adds exactly 2 more: ONE exchange of the slim
    (source, score) threshold branch (a column-pruned second scoring
    pass — deliberately cheaper at 100 TB than the alternative, a
    rank window over the FULL frame, which would exchange+sort the
    corpus at full row width, text included) and the per-source
    thresholds BroadcastExchange (KB-sized).  The corpus side of the
    join-back must NOT exchange — excepting the r16 scan-parallelism
    repair (core/parallel.py): at test SF the single-row-group scan
    is widened by a RoundRobinPartitioning exchange under each scan
    branch (ensure_min_parallelism is identity once the scan is
    already >= defaultParallelism wide, so these nodes vanish at the
    100 TB design point and are excluded from the algorithmic
    budget; their count is capped separately so a widen can never
    silently multiply)."""
    from smashed_spark.plans.queries_scale import q_text_stats

    plan = _explain(q_text_stats(spark, sf_dir))
    n_widen = _count_widen_exchanges(plan)
    assert n_widen <= 3, plan
    assert plan.count("Exchange (") - n_widen <= 5, plan
    assert plan.count("BroadcastExchange (") >= 1, plan
    assert plan.count("HashAggregate (") >= 4, plan
    assert "CartesianProduct" not in plan, plan


def test_ngram_cap_adds_no_extra_exchange(spark, sf_dir):
    """grouplist path: the hub-shingle frequency cap is a count window
    over the same hashpartitioning(__s__) the pair-generation groupBy
    needs — exactly two exchanges total (shingle key + final pair key).
    A third exchange means the cap's frequency filter stopped reusing
    the shingle partitioning.  The default join path must stay a plain
    equi-join: no CartesianProduct, no BroadcastNestedLoopJoin."""
    from smashed_spark.functions.dedup import NGramJaccardPairsMapper

    df = load(spark, sf_dir, "documents").withColumn(
        "words", F.split("text", " ")
    )
    grouplist = _explain(
        NGramJaccardPairsMapper(
            "doc_id",
            threshold=0.2,
            max_shingle_freq=1024,
            method="grouplist",
        ).map(df)
    )
    assert grouplist.count("Exchange (") == 2, grouplist
    join = _explain(
        NGramJaccardPairsMapper(
            "doc_id", threshold=0.2, max_shingle_freq=1024
        ).map(df)
    )
    assert "CartesianProduct" not in join, join
    assert "BroadcastNestedLoopJoin" not in join, join


def test_curation_chain_single_exchange(spark, sf_dir):
    """The corpus-composition chain — sample_mix(method='hash') ->
    quota_sample -> hash_split — composes NARROWLY: mixing is a scan-
    speed hash filter + metadata union, split assignment is a pure
    per-row hash, and the only exchange in the whole pipeline is the
    quota window's group shuffle, whose row_number()<=N compiles to a
    WindowGroupLimit (partial per-group top-N below the exchange).
    All three share the portable md5 key convention, so the composed
    output is partitioning-independent end to end."""
    from smashed_spark.sources.loaders import (
        hash_split,
        quota_sample,
        sample_mix,
    )

    docs = load(spark, sf_dir, "documents")
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    mixed = sample_mix(
        [a, b], [0.8, 0.3], method="hash", key_field="doc_id"
    )
    capped = quota_sample(
        mixed, ["lang"], max_per_group=50, key_field="doc_id"
    )
    tagged = hash_split(
        capped,
        {"train": 0.8, "val": 0.1, "test": 0.1},
        key_field="doc_id",
    )
    plan = _explain(tagged)
    # ONE exchange (the quota group shuffle), with the partial + final
    # WindowGroupLimit pair around it; no Python stage anywhere
    assert plan.count("Exchange (") == 1, plan
    assert plan.count("WindowGroupLimit (") == 2, plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan, plan


def test_semantic_pairs_single_exchange_no_cartesian(spark, sf_dir):
    """SemDeDup pairs: ONE exchange (the cell-key shuffle into the
    per-cell Arrow stage) beyond the scan — never a cartesian/nested-
    loop term, and exactly one Python stage (the chunked matmul)."""
    from smashed_spark.functions.dedup import SemanticNearDupPairsMapper

    df = load(spark, sf_dir, "embeddings")
    out = SemanticNearDupPairsMapper(
        threshold=0.35, n_centroids=4, max_iter=2
    ).map(df)
    plan = _explain(out)
    for bad in ("CartesianProduct", "BroadcastNestedLoop"):
        assert bad not in plan, plan
    assert plan.count("FlatMapGroupsInPandas (") == 1, plan
    # scan -> assign (ArrowEval) -> exchange on cell -> grouped matmul
    assert plan.count("Exchange (") == 1, plan


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmp_path):
    """write_bucketed_table's contract at 100 TB: two tables bucketed
    on the join key with equal bucket counts sort-merge-join with NO
    exchange on either side — the shuffle was paid once at write time.
    (Broadcast disabled so the small test tables take the SMJ path.)"""
    from smashed_spark.sources.sinks import write_bucketed_table

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    stats = docs.select("doc_id", (F.col("n_chars") * 2).alias("x"))
    ta, tb = "t_bkt_docs", "t_bkt_stats"
    spark.sql(f"DROP TABLE IF EXISTS {ta}")
    spark.sql(f"DROP TABLE IF EXISTS {tb}")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed_table(
            docs, ta, ["doc_id"], 4, sort_by=["doc_id"], mode="overwrite"
        )
        write_bucketed_table(
            stats, tb, ["doc_id"], 4, sort_by=["doc_id"], mode="overwrite"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(ta).join(spark.table(tb), "doc_id")
        plan = _explain(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # bucket pruning metadata visible on the scans
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan
        assert joined.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_semantic_decontaminate_no_shuffle(spark, sf_dir):
    """The 100 TB contract of SemanticDecontaminateMapper: the corpus
    side is scan -> Arrow mapInPandas, ZERO exchanges — the benchmark
    travels as a broadcast variable, never as a join side."""
    from smashed_spark.functions.textstats import (
        SemanticDecontaminateMapper,
    )

    emb = load(spark, sf_dir, "embeddings")
    out = SemanticDecontaminateMapper(
        emb.filter(F.col("vec_id") % 40 == 0), threshold=0.35
    ).map(emb)
    plan = _explain(out)
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan, plan


def test_sample_mix_curation_chain_plan(spark, sf_dir):
    """The full r7 curation-chain gate plan: no cartesian/nested-loop
    node anywhere, and both incremental-dedup index joins run as
    BROADCAST joins at gate scale (the digest LeftAnti join and the
    band-index indicator LeftOuter join of the fuzzy stage's linear
    decision pipeline) — the corpus side never shuffles for them."""
    import __spark_entry__ as E

    out = E.queries()["sample_mix"](spark, sf_dir)
    plan = _explain(out)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    tree = plan.split("===== Subqueries")[0]
    assert "BroadcastHashJoin" in tree, plan
    assert "LeftAnti" in tree, plan
    assert "LeftOuter" in tree, plan


def test_fuzzy_dedup_simhash_128_bit_composes(spark):
    """fuzzy_dedup(method='simhash', simhash_bits=128): the wide
    two-word fingerprint tier threads through the one-call recipe —
    exact dups cluster, the unrelated doc survives alone."""
    from smashed_spark.functions.dedup import fuzzy_dedup

    words_a = [f"w{i}" for i in range(30)]
    rows = [
        (1, " ".join(words_a)),
        (2, " ".join(words_a)),            # identical -> same cluster
        (3, " ".join(f"z{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    out = {
        r.doc_id: (r.cluster_id, r.is_kept)
        for r in fuzzy_dedup(
            df, method="simhash", simhash_bits=128, max_hamming=3
        ).collect()
    }
    assert out[1] == (1, 1) and out[2] == (1, 0)
    assert out[3] == (3, 1)


@pytest.mark.slow
def test_no_row_python_eval_in_any_gate_plan(spark, sf_dir):
    """The repo-wide claim VERDICT audits by hand — 'no row-at-a-time
    Python UDF anywhere in the hot paths' — pinned as a sweep: every
    registry query's physical plan is linted for BatchEvalPython.
    Arrow-tier Python (pandas_udf / mapInPandas) is the documented
    legitimate tier and is NOT restricted.  Plans are built, never
    executed (lifecycle gates do write their temp inputs during
    construction — that side effect is part of building the plan)."""
    from smashed_spark.core.lint import plan_report
    from smashed_spark.plans.registry import QUERIES

    offenders = {}
    for name, fn in sorted(QUERIES.items()):
        df = fn(spark, sf_dir)
        counts = plan_report(df)["counts"]
        if counts["python_row_evals"]:
            offenders[name] = counts["python_row_evals"]
    assert not offenders, (
        f"row-at-a-time Python eval found in gate plans: {offenders}"
    )


# ---------------------------------------------------------------------------
# r13: the same sweep over DEMO code — every example script runs with
# lint hooks patched into every DataFrame action (tools/
# lint_examples.py), so an example cannot regress into the Python-eval
# tier while still "working".  ONE subprocess sweeps all examples (a
# shared JVM; per-example processes would pay 15 JVM boots), then the
# parametrized test reports each example's verdict individually.
# ---------------------------------------------------------------------------

_EXAMPLES = sorted(
    os.path.basename(p)
    for p in glob.glob(
        os.path.join(os.path.dirname(__file__), "..", "examples", "*.py")
    )
)


@pytest.fixture(scope="session")
def example_lint_results():
    import json
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "lint_examples.py")],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    line = next(
        (
            ln
            for ln in reversed(proc.stdout.splitlines())
            if ln.startswith("RESULTS: ")
        ),
        None,
    )
    assert line is not None, (
        f"lint_examples.py produced no RESULTS line; "
        f"stderr tail: {proc.stderr[-2000:]}"
    )
    return json.loads(line[len("RESULTS: "):])


@pytest.mark.slow
@pytest.mark.parametrize("example", _EXAMPLES)
def test_no_row_python_eval_in_example_plans(
    example, example_lint_results
):
    res = example_lint_results.get(example)
    assert res is not None, f"{example} was not swept"
    assert res["error"] is None, f"{example} failed: {res['error']}"
    assert res["python_row_evals"] == 0, (
        f"{example} executed {res['python_row_evals']} row-at-a-time "
        "Python eval(s) — see tools/lint_examples.py"
    )
