"""As-of and range join operators: hand-computed semantics, DuckDB
ASOF JOIN parity over the events testdata, and plan-shape assertions
(the whole point of these operators is avoiding theta-join plans).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from smashed_spark.functions.asof import (
    AsofJoinMapper,
    RangeJoinMapper,
    asof_join,
)


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, "l0"), (1, 25, "l1"), (1, 5, "l2"), (2, 10, "l3")],
        "k: bigint, t: bigint, lv: string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 20, "r20"), (2, 99, "r99")],
        "k: bigint, t: bigint, rv: string",
    )
    out = {
        r.lv: (r.t_asof, r.rv_asof)
        for r in asof_join(left, right, on="t", by=["k"]).collect()
    }
    assert out["l0"] == (10, "r10")  # exact-ts match (<=, not <)
    assert out["l1"] == (20, "r20")  # latest earlier
    assert out["l2"] == (None, None)  # nothing earlier
    assert out["l3"] == (None, None)  # right row is later


def test_asof_join_null_payload_is_not_replaced_by_stale_row(spark):
    """A genuinely-NULL payload value in the matched right row must
    come through as NULL — not be papered over with a stale value from
    an older right row (the per-column last(ignorenulls) trap): the
    whole matched row is carried as one struct."""
    left = spark.createDataFrame(
        [(1, 20, "l")], "k: bigint, t: bigint, lv: string"
    )
    right = spark.createDataFrame(
        [(1, 5, "old", "o2"), (1, 10, None, "n2")],
        "k: bigint, t: bigint, rv: string, rw: string",
    )
    out = asof_join(left, right, on="t", by=["k"]).collect()[0]
    assert out.t_asof == 10
    assert out.rv_asof is None  # matched row's value, not 'old'
    assert out.rw_asof == "n2"  # same matched row for every column


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b")], "k: bigint, t: bigint, lv: string"
    )
    right = spark.createDataFrame(
        [(1, 95, "near"), (1, 90, "far")], "k: bigint, t: bigint, rv: string"
    )
    out = {
        r.lv: r.rv_asof
        for r in asof_join(
            left, right, on="t", by=["k"], tolerance=F.lit(10)
        ).collect()
    }
    assert out["a"] == "near"  # 95 within 100-10
    assert out["b"] is None  # 95 < 200-10: stale


def test_asof_join_matches_duckdb_on_events(spark, sf_dir):
    """Parity with DuckDB's native ASOF JOIN over the real events
    table: first 200 events per side, value carried backward per
    user."""
    from smashed_spark.plans.registry import load

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t"), "value"
    )
    left = ev.limit(200)
    right = ev.orderBy(F.desc("t")).limit(200).select(
        "user_id", "t", F.col("value").alias("rv")
    )
    got = sorted(
        (r.user_id, r.t, r.t_asof, r.rv_asof)
        for r in asof_join(left, right, on="t", by=["user_id"]).collect()
    )

    lpd = left.toPandas()
    rpd = right.toPandas()
    con = duckdb.connect()
    con.register("l", lpd)
    con.register("r", rpd)
    want = sorted(
        (u, t, mt, mv)
        for u, t, mt, mv in con.execute(
            """
            SELECT l.user_id, l.t, r.t, r.rv
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.t >= r.t
            """
        ).fetchall()
    )
    assert got == want and got


def test_asof_join_matches_pandas_merge_asof_randomized(spark):
    """Randomized multi-key parity with pandas merge_asof (backward,
    allow_exact_matches=True) — an independent second oracle beside
    DuckDB's ASOF JOIN."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(17)
    lpd = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 120),
            "t": rng.choice(10_000, 120, replace=False).astype("int64"),
        }
    )
    rpd = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 80),
            "t": rng.choice(10_000, 80, replace=False).astype("int64"),
            "rv": rng.randint(0, 1000, 80).astype("int64"),
        }
    )
    left = spark.createDataFrame(lpd)
    right = spark.createDataFrame(rpd)
    got = sorted(
        (r.k, r.t, r.t_asof, r.rv_asof)
        for r in asof_join(left, right, on="t", by=["k"]).collect()
    )
    merged = pd.merge_asof(
        lpd.sort_values("t"),
        rpd.sort_values("t").rename(columns={"t": "t_asof"}),
        left_on="t",
        right_on="t_asof",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    to_int = lambda v: None if pd.isna(v) else int(v)  # noqa: E731
    want = sorted(
        (int(r.k), int(r.t), to_int(r.t_asof), to_int(r.rv))
        for r in merged.itertuples()
    )
    assert got == want and got


def test_asof_join_plan_has_no_join_node(spark):
    left = spark.createDataFrame(
        [(1, 10, "x")], "k: bigint, t: bigint, lv: string"
    )
    right = spark.createDataFrame(
        [(1, 5, "y")], "k: bigint, t: bigint, rv: string"
    )
    plan = _explain(asof_join(left, right, on="t", by=["k"]))
    for node in ("Join", "CartesianProduct", "BroadcastNestedLoop"):
        assert node not in plan, (node, plan)
    assert plan.count("Exchange (") == 1, plan  # one shuffle on the key


def test_asof_mapper_composes(spark):
    left = spark.createDataFrame(
        [(1, 10, "x")], "k: bigint, t: bigint, lv: string"
    )
    right = spark.createDataFrame(
        [(1, 5, "y")], "k: bigint, t: bigint, rv: string"
    )
    out = AsofJoinMapper(right, on="t", by=["k"]).map(left).collect()[0]
    assert out.rv_asof == "y" and out.t_asof == 5


def test_range_join_inner_and_left(spark):
    points = spark.createDataFrame(
        [(0, 5.0), (1, 15.0), (2, 42.0)], "pid: bigint, x: double"
    )
    ivals = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 4.0, 16.0), ("c", 100.0, 101.0)],
        "name: string, start: double, end: double",
    )
    inner = RangeJoinMapper(
        ivals, point_field="x", bucket_width=8.0
    ).map(points)
    got = sorted((r.pid, r.name) for r in inner.collect())
    assert got == [(0, "a"), (0, "b"), (1, "b")]
    left = RangeJoinMapper(
        ivals, point_field="x", bucket_width=8.0, how="left"
    ).map(points)
    got = sorted((r.pid, r.name) for r in left.collect())
    assert got == [(0, "a"), (0, "b"), (1, "b"), (2, None)]


def test_range_join_matches_exact_theta(spark):
    """Bucketed candidates + exact verify must equal the plain
    inequality (theta) join it replaces, on randomized intervals."""
    import numpy as np

    rng = np.random.RandomState(3)
    pts = [(int(i), float(x)) for i, x in enumerate(rng.uniform(0, 100, 300))]
    ivs = []
    for i in range(60):
        s = float(rng.uniform(0, 95))
        ivs.append((int(i), s, s + float(rng.uniform(0.5, 12))))
    points = spark.createDataFrame(pts, "pid: bigint, x: double")
    ivals = spark.createDataFrame(
        ivs, "iid: bigint, start: double, end: double"
    )
    got = sorted(
        (r.pid, r.iid)
        for r in RangeJoinMapper(
            ivals, point_field="x", bucket_width=4.0
        ).map(points).collect()
    )
    want = sorted(
        (p, i) for p, x in pts for i, s, e in ivs if s <= x < e
    )
    assert got == want and got


def test_range_join_plan_is_equi_join(spark):
    points = spark.createDataFrame([(0, 5.0)], "pid: bigint, x: double")
    ivals = spark.createDataFrame(
        [("a", 0.0, 10.0)], "name: string, start: double, end: double"
    )
    plan = _explain(
        RangeJoinMapper(ivals, point_field="x", bucket_width=8.0).map(points)
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_range_join_guards_unbounded_fanout(spark):
    """An interval spanning more buckets than the cap must fail fast
    with a pointed error, not silently explode 10^8 bucket rows."""
    points = spark.createDataFrame([(0, 5.0)], "pid: bigint, x: double")
    huge = spark.createDataFrame(
        [("open", 0.0, 1e9)], "name: string, start: double, end: double"
    )
    m = RangeJoinMapper(huge, point_field="x", bucket_width=1.0)
    with pytest.raises(Exception, match="spans more than"):
        m.map(points).collect()
    # raising the cap opts into the fan-out explicitly
    ok = RangeJoinMapper(
        huge,
        point_field="x",
        bucket_width=1e8,
        max_buckets_per_interval=100,
    )
    assert ok.map(points).count() == 1


def test_range_join_validation(spark):
    ivals = object()
    with pytest.raises(ValueError, match="unknown how"):
        RangeJoinMapper(ivals, point_field="x", how="outer")
    with pytest.raises(ValueError, match="bucket_width"):
        RangeJoinMapper(ivals, point_field="x", bucket_width=0)


def test_asof_join_ignores_null_timestamps(spark):
    """ADVICE r4: null join keys never match — a null-`on` right row
    sorts nulls-first carrying a non-null payload struct, and every
    left row with no real earlier match would surface it (t_asof NULL
    but rv_asof set).  DuckDB ASOF / pandas merge_asof both ignore
    null keys; left rows with null `on` likewise come out unmatched."""
    left = spark.createDataFrame(
        [(1, 10, "l0"), (1, None, "lnull")],
        "k: bigint, t: bigint, lv: string",
    )
    right = spark.createDataFrame(
        [(1, None, "rnull"), (1, 50, "late")],
        "k: bigint, t: bigint, rv: string",
    )
    out = {
        r.lv: (r.t_asof, r.rv_asof)
        for r in asof_join(left, right, on="t", by=["k"]).collect()
    }
    # no earlier non-null right row exists for either left row
    assert out["l0"] == (None, None)
    assert out["lnull"] == (None, None)
