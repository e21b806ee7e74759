"""Connected components / dedup clustering: hand graphs, a long-path
worst case (exercises the pointer-jumping log-round bound), and a
randomized corpus checked against a driver-side union-find oracle.
"""

import random

import pytest
from pyspark.sql import functions as F

from smashed_spark.functions.graph import (
    DedupClustersMapper,
    connected_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a: bigint, id_b: bigint")
    return {
        r.node: r.component for r in connected_components(df).collect()
    }


def test_cc_two_components_and_self_loops(spark):
    got = _cc(spark, [(1, 2), (2, 3), (7, 8), (3, 3), (2, 1)])
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_cc_long_path_converges_in_log_rounds(spark):
    """A 200-node path is the propagation worst case: plain
    neighbor-min needs ~200 rounds, the pointer-jumped loop must stay
    within its 30-round cap (doubling reach per round)."""
    edges = [(i, i + 1) for i in range(200)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0} and len(got) == 201


def test_cc_matches_union_find_on_random_graph(spark):
    rng = random.Random(11)
    nodes = list(range(400))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}
    # path-compress fully: root may itself point down a chain
    want = {n: find(n) for n in parent}
    got = _cc(spark, edges)
    assert got == want


def test_cc_raises_without_convergence_budget(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "id_a: bigint, id_b: bigint"
    )
    with pytest.raises(RuntimeError, match="no convergence"):
        # small_graph_edges=0 pins the distributed path (the driver
        # union-find tier has no iteration cap to hit)
        connected_components(df, max_iterations=2, small_graph_edges=0)


def test_dedup_clusters_mapper_end_to_end(spark):
    """Pairs -> clusters -> keeper flags over a corpus that includes
    pairless (singleton) docs."""
    corpus = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(8)], "doc_id: bigint, text: string"
    )
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (6, 7)], "id_a: bigint, id_b: bigint"
    )
    out = {
        r.doc_id: (r.cluster_id, r.is_kept)
        for r in DedupClustersMapper(pairs).map(corpus).collect()
    }
    assert out[0] == (0, 1) and out[3] == (0, 0) and out[5] == (0, 0)
    assert out[6] == (6, 1) and out[7] == (6, 0)
    for singleton in (1, 2, 4):
        assert out[singleton] == (singleton, 1)


def test_dedup_clusters_quality_representative(spark):
    """quality_field switches the keeper policy to highest-quality
    member (tiebreak min id; NULLs sort lowest; all-NULL cluster falls
    back to min id).  cluster_id stays the min id, singletons are
    always kept, and schema/column order matches the default path."""
    corpus = spark.createDataFrame(
        [
            (0, 0.1),     # cluster {0,3,5}: 5 has max quality
            (1, 0.9),     # singleton
            (2, None),    # singleton, NULL quality still kept
            (3, 0.5),
            (4, 0.2),     # singleton
            (5, 0.8),
            (6, 0.7),     # cluster {6,7}: tie -> min id 6
            (7, 0.7),
            (8, None),    # cluster {8,9}: all NULL -> min id 8
            (9, None),
        ],
        "doc_id: bigint, q: double",
    )
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (6, 7), (8, 9)], "id_a: bigint, id_b: bigint"
    )
    m = DedupClustersMapper(pairs, quality_field="q")
    res = m.map(corpus)
    assert res.columns == ["doc_id", "q", "cluster_id", "is_kept"]
    out = {
        r.doc_id: (r.cluster_id, r.is_kept) for r in res.collect()
    }
    assert out[5] == (0, 1) and out[0] == (0, 0) and out[3] == (0, 0)
    assert out[6] == (6, 1) and out[7] == (6, 0)
    assert out[8] == (8, 1) and out[9] == (8, 0)
    for singleton in (1, 2, 4):
        assert out[singleton] == (singleton, 1)
    # exactly one keeper per cluster, partition-invariant
    out2 = {
        r.doc_id: (r.cluster_id, r.is_kept)
        for r in m.map(corpus.repartition(7)).collect()
    }
    assert out2 == out
    # NaN quality must NOT win (Spark sorts NaN above every double):
    # it ranks like NULL, so the real-scored member is kept
    nan_corpus = spark.createDataFrame(
        [(0, 0.4), (1, float("nan")), (2, None)],
        "doc_id: bigint, q: double",
    )
    nan_pairs = spark.createDataFrame(
        [(0, 1), (1, 2)], "id_a: bigint, id_b: bigint"
    )
    nan_out = {
        r.doc_id: r.is_kept
        for r in DedupClustersMapper(nan_pairs, quality_field="q")
        .map(nan_corpus)
        .collect()
    }
    assert nan_out == {0: 1, 1: 0, 2: 0}


def test_fuzzy_dedup_quality_field_plumbs_through(spark):
    """fuzzy_dedup(quality_field=...) keeps the best member of each
    near-dup cluster instead of the min id."""
    from smashed_spark.functions.dedup import fuzzy_dedup

    base = [f"w{i}" for i in range(30)]
    near = base[:-1] + ["swapped"]
    other = [f"u{i}" for i in range(25)]
    df = spark.createDataFrame(
        [
            (1, " ".join(base), 0.2),
            (2, " ".join(near), 0.9),   # near-dup of 1, higher quality
            (3, " ".join(other), 0.5),  # unrelated
        ],
        "doc_id: bigint, text: string, q: double",
    ).withColumn("words", F.split("text", " "))
    res = {
        r.doc_id: (r.cluster_id, r.is_kept)
        for r in fuzzy_dedup(
            df, method="minhash", threshold=0.5, quality_field="q"
        ).collect()
    }
    assert res[1] == (1, 0) and res[2] == (1, 1)  # best member kept
    assert res[3] == (3, 1)
    # default policy on the same corpus keeps the min id
    res_min = {
        r.doc_id: r.is_kept
        for r in fuzzy_dedup(
            df, method="minhash", threshold=0.5
        ).collect()
    }
    assert res_min == {1: 1, 2: 0, 3: 1}


def test_cc_plan_per_round_is_equi_join_only(spark):
    """No cartesian/broadcast-nested-loop term may appear anywhere in
    an iteration's plan — the per-round cost contract is O(|E|+|V|)."""
    df = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a: bigint, id_b: bigint"
    )
    # one round's worth of plan: build the propagation frame unchecked
    e = df.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    )
    bidir = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = (
        bidir.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    nbr = (
        bidir.join(labels.withColumnRenamed("node", "v"), "v")
        .groupBy(F.col("u").alias("node"))
        .agg(F.min("component").alias("nbr_min"))
    )
    plan = nbr._sc._jvm.PythonSQLUtils.explainString(
        nbr._jdf.queryExecution(), "formatted"
    )
    for bad in ("CartesianProduct", "BroadcastNestedLoop"):
        assert bad not in plan, plan


def test_cc_refuses_non_integer_ids(spark):
    """String ids must raise, not silently cast to null and report an
    empty clustering."""
    df = spark.createDataFrame(
        [("doc-1", "doc-2")], "id_a: string, id_b: string"
    )
    with pytest.raises(TypeError, match="integer id"):
        connected_components(df)


def test_small_graph_tier_matches_distributed(spark):
    """The driver union-find tier and the distributed pointer-jumping
    rounds must produce identical labels — including on an empty edge
    list and on the long-path worst case."""
    import random

    rng = random.Random(3)
    edges = [
        (rng.randrange(300), rng.randrange(300)) for _ in range(500)
    ] + [(i, i + 1) for i in range(100, 180)]
    df = spark.createDataFrame(edges, "id_a: bigint, id_b: bigint")
    fast = {
        r.node: r.component
        for r in connected_components(df).collect()  # driver tier
    }
    dist = {
        r.node: r.component
        for r in connected_components(df, small_graph_edges=0).collect()
    }
    assert fast == dist

    empty = spark.createDataFrame([], "id_a: bigint, id_b: bigint")
    assert connected_components(empty).count() == 0


def test_dedup_report(spark):
    """One-row audit summary replayed in python: counts, duplicate
    rate, cluster stats, token accounting."""
    from smashed_spark.functions.dedup import dedup_report

    corpus = spark.createDataFrame(
        [(i, f"doc{i}", 10 * (i + 1)) for i in range(8)],
        "doc_id: bigint, text: string, n_tok: bigint",
    )
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (6, 7)], "id_a: bigint, id_b: bigint"
    )
    tagged = DedupClustersMapper(pairs).map(corpus)
    row = dedup_report(tagged, tokens_field="n_tok").collect()[0]
    # clusters: {0,3,5} keep 0, {6,7} keep 6, singletons 1,2,4
    assert row.n_docs == 8 and row.n_kept == 5 and row.n_dropped == 3
    assert row.n_dup_clusters == 2 and row.max_cluster_size == 3
    assert row.dup_rate == round(3 / 8, 6)
    toks = {i: 10 * (i + 1) for i in range(8)}
    dropped = toks[3] + toks[5] + toks[7]
    assert row.tokens_total == sum(toks.values())
    assert row.tokens_dropped == dropped
    assert row.tokens_kept == sum(toks.values()) - dropped
    # without tokens_field the token columns are absent
    slim = dedup_report(tagged)
    assert "tokens_total" not in slim.columns
    assert slim.collect()[0].n_docs == 8
    # r9: running-index accounting rides the global row (32 B/doc
    # digests; 36 B x bands band keys when the band count is given)
    assert row.index_digest_bytes == 5 * 32
    banded = dedup_report(tagged, index_bands=4).collect()[0]
    assert banded.index_band_bytes == 5 * 36 * 4

    # r9: per-source view — one row per source, replayed in python
    src_tagged = tagged.withColumn(
        "src",
        F.when(F.col("doc_id") < 4, F.lit("web")).otherwise(
            F.lit("books")
        ),
    )
    rows = {
        r.source: r
        for r in dedup_report(
            src_tagged, tokens_field="n_tok", source_field="src"
        ).collect()
    }
    # clusters {0,3,5} keep 0, {6,7} keep 6: web drops 3, books drops
    # 5 and 7
    assert rows["web"].n_docs == 4 and rows["web"].n_dropped == 1
    assert rows["books"].n_docs == 4 and rows["books"].n_dropped == 2
    assert rows["web"].dup_rate == round(1 / 4, 6)
    assert rows["books"].tokens_dropped == toks[5] + toks[7]
    assert rows["web"].tokens_kept == sum(
        toks[i] for i in (0, 1, 2)
    )
    # cluster-shape stats are global-only by contract
    assert "n_dup_clusters" not in dedup_report(
        src_tagged, source_field="src"
    ).columns
    # per-source rows report each source's own index contribution
    rows_idx = {
        r.source: r
        for r in dedup_report(
            src_tagged, source_field="src", index_bands=4
        ).collect()
    }
    assert rows_idx["web"].index_digest_bytes == 3 * 32
    assert rows_idx["books"].index_band_bytes == 2 * 36 * 4
    # ONE slim exchange: the per-source plan aggregates once
    per_src_plan = dedup_report(
        src_tagged, source_field="src"
    )._sc._jvm.PythonSQLUtils.explainString(
        dedup_report(src_tagged, source_field="src")
        ._jdf.queryExecution(),
        "formatted",
    ).split("===== Subqueries")[0]
    # global sort for the orderBy + one agg exchange; no cluster_id
    # exchange
    assert per_src_plan.count("HashAggregate (") == 2, per_src_plan
