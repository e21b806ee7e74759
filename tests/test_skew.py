"""Skew utilities must produce results identical to the direct plan."""

from pyspark.sql import functions as F

from smashed_spark.core.skew import salted_groupby_agg, salted_join
from smashed_spark.plans.registry import load


def test_salted_groupby_matches_direct(spark, sf_dir):
    df = load(spark, sf_dir, "events")
    direct = df.groupBy("event_type").agg(
        F.sum("value").alias("total"),
        F.count("value").alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    salted = salted_groupby_agg(
        df,
        ["event_type"],
        {
            "total": ("value", "sum"),
            "n": ("value", "count"),
            "lo": ("value", "min"),
            "hi": ("value", "max"),
        },
    )
    d = {r.event_type: (round(r.total, 6), r.n, r.lo, r.hi) for r in direct.collect()}
    s = {r.event_type: (round(r.total, 6), r.n, r.lo, r.hi) for r in salted.collect()}
    assert d == s


def test_salted_join_matches_direct(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    direct = orders.join(customer, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, customer, "o_custkey").select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_groupby_rejects_nonalgebraic():
    import pytest

    with pytest.raises(ValueError):
        salted_groupby_agg(None, ["k"], {"a": ("v", "median")})


def test_salted_groupby_avg_matches_direct(spark, sf_dir):
    """r9: avg decomposes to per-salt (sum, count) pairs merged then
    divided — exact under re-merge (averaging per-salt averages would
    weight salts, not rows), NULL semantics identical to F.avg."""
    df = load(spark, sf_dir, "events").withColumn(
        "v_null",
        F.when(F.col("event_id") % 7 == 0, None).otherwise(
            F.col("value")
        ),
    )
    direct = df.groupBy("event_type").agg(
        F.avg("value").alias("m"),
        F.avg("v_null").alias("mn"),
        F.sum("value").alias("t"),
    )
    salted = salted_groupby_agg(
        df,
        ["event_type"],
        {
            "m": ("value", "avg"),
            "mn": ("v_null", "mean"),
            "t": ("value", "sum"),
        },
    )
    d = {
        r.event_type: (round(r.m, 6), round(r.mn, 6), round(r.t, 6))
        for r in direct.collect()
    }
    s = {
        r.event_type: (round(r.m, 6), round(r.mn, 6), round(r.t, 6))
        for r in salted.collect()
    }
    assert d == s
    assert sorted(salted.columns) == ["event_type", "m", "mn", "t"]


def test_hot_keys_exact_and_superset(spark):
    """r9: hot_keys finds exactly the keys at/above the support
    threshold (python Counter replay), the inexact mode returns a
    superset, NULLs are never candidates, and support below the
    freqItems bound raises."""
    import random

    import pytest

    from smashed_spark.core.skew import hot_keys

    rng = random.Random(7)
    # Zipf-ish: key 0 ~50%, key 1 ~25%, tail uniform over 100 keys
    rows = []
    for i in range(4000):
        r = rng.random()
        k = 0 if r < 0.5 else (1 if r < 0.75 else rng.randint(2, 101))
        rows.append((k,))
    rows += [(None,)] * 40
    df = spark.createDataFrame(rows, "k: bigint")

    from collections import Counter

    counts = Counter(k for (k,) in rows if k is not None)
    total = len(rows)
    support = 0.05
    want = sorted(k for k, c in counts.items() if c >= support * total)
    got = hot_keys(df, "k", support=support)
    assert got == want and 0 in got and 1 in got

    # superset mode: single pass, must contain every true hot key
    approx = hot_keys(df, "k", support=support, exact=False)
    assert set(want) <= set(approx)
    assert None not in approx

    # partition invariance of the exact result
    assert hot_keys(df.repartition(13), "k", support=support) == want

    with pytest.raises(ValueError, match="support"):
        hot_keys(df, "k", support=1e-5)


def test_hot_keys_exactly_at_support_boundary(spark):
    """ADVICE r9: freqItems only guarantees items with frequency
    STRICTLY above its support argument, so a key sitting exactly at
    the promised fraction could miss the candidate set.  hot_keys now
    probes with a nudged-down support — a key at exactly support *
    total must always be returned."""
    from smashed_spark.core.skew import hot_keys

    # key 7 appears in exactly 10% of 2000 rows; tail keys are unique
    rows = [(7,)] * 200 + [(1000 + i,) for i in range(1800)]
    df = spark.createDataFrame(rows, "k: bigint")
    assert hot_keys(df, "k", support=0.1) == [7]
    # and at the floor support value the clamp keeps freqItems legal;
    # the floor warning is INTENDED here — assert it instead of
    # letting it leak into the suite output (r11 VERDICT nit)
    import warnings as _warnings

    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        assert 7 in hot_keys(df, "k", support=1e-4)
    assert any("freqItems floor" in str(w.message) for w in caught)


def test_salted_join_targeted_hot_keys(spark):
    """r9: hot-targeted salting must join identically to the plain
    join (inner / left / anti), replicate ONLY hot dimension rows,
    and reject non-fact-preserving join types (an unmatched dim row
    would otherwise be emitted once per salt replica)."""
    import pytest

    from smashed_spark.core.skew import hot_keys, salted_join

    fact = spark.createDataFrame(
        [(i, i % 10 if i % 3 else 0) for i in range(3000)],
        "row_id: bigint, k: bigint",
    )
    # dim covers keys 0..7 only -> keys 8,9 unmatched on the fact side
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(8)], "k: bigint, name: string"
    )
    hot = hot_keys(fact, "k", support=0.2)
    # key 0 carries 1200/3000 = 40% of fact rows (1000 via i%3==0 +
    # 200 via i%10==0 with i%3!=0) — the only key above support=0.2
    assert hot == [0]

    for how in ("inner", "left", "left_anti"):
        direct = fact.join(dim, "k", how)
        salted = salted_join(fact, dim, "k", how=how, hot=hot)
        dcols = sorted(direct.columns)
        assert sorted(salted.columns) == dcols
        assert sorted(
            tuple(r[c] for c in dcols) for r in direct.collect()
        ) == sorted(
            tuple(r[c] for c in dcols) for r in salted.collect()
        ), how

    # empty hot list degenerates to the plain join
    assert salted_join(
        fact, dim, "k", hot=[]
    ).count() == fact.join(dim, "k").count()

    # full replication still works and agrees
    assert salted_join(fact, dim, "k").count() == fact.join(
        dim, "k"
    ).count()

    # non-fact-preserving types raise loudly in BOTH modes
    for how in ("right", "full", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="fact-preserving"):
            salted_join(fact, dim, "k", how=how)
        with pytest.raises(ValueError, match="fact-preserving"):
            salted_join(fact, dim, "k", how=how, hot=hot)


def test_hot_keys_warns_at_freqitems_floor(spark):
    """ADVICE r10: at support == 1e-4 the probe cannot be nudged below
    Spark's freqItems floor, so the exact-boundary guarantee does not
    hold there — hot_keys must say so (a warning, not silence)."""
    import warnings

    from smashed_spark.core.skew import hot_keys

    df = spark.createDataFrame([(i,) for i in range(50)], "k: bigint")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        hot_keys(df, "k", support=1e-4)
    assert any("freqItems floor" in str(x.message) for x in w), [
        str(x.message) for x in w
    ]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        hot_keys(df, "k", support=0.1)
    assert not any("freqItems floor" in str(x.message) for x in w)


def test_hot_keys_floor_warning_fires_for_approx_mode_too(spark):
    """Code review r11: exact=False returns the superset AS the final
    answer, so the boundary-miss warning must fire there too."""
    import warnings

    from smashed_spark.core.skew import hot_keys

    df = spark.createDataFrame([(i,) for i in range(50)], "k: bigint")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        hot_keys(df, "k", support=1e-4, exact=False)
    assert any("freqItems floor" in str(x.message) for x in w)


def test_hot_keys_cms_matches_hot_keys_and_superset(spark):
    """r12: the mergeable heavy-hitter variant — exact self-fit mode
    must agree with hot_keys on the same frame; estimate-only mode
    must be a superset of the truth."""
    from smashed_spark.core.skew import hot_keys, hot_keys_cms

    rows = (
        [(7,)] * 200 + [(9,)] * 120 + [(1000 + i,) for i in range(1680)]
    )
    df = spark.createDataFrame(rows, "k: bigint")
    assert hot_keys_cms(df, "k", support=0.05) == hot_keys(
        df, "k", support=0.05
    ) == [7, 9]
    sup = hot_keys_cms(df, "k", support=0.05, exact=False)
    assert set(sup) >= {7, 9}


def test_hot_keys_cms_running_sketch_across_batches(spark):
    """The reason this variant exists: per-batch fits merge into a
    running sketch, so a key whose mass accumulated across batches is
    flagged by a later batch without rescanning history."""
    import pytest

    from smashed_spark.core.skew import hot_keys_cms
    from smashed_spark.functions.cms import fit_cms

    b1 = spark.createDataFrame(
        [(5,)] * 60 + [(100 + i,) for i in range(140)], "k: bigint"
    )
    b2 = spark.createDataFrame(
        [(5,)] * 60 + [(300 + i,) for i in range(140)], "k: bigint"
    )
    running = fit_cms(b1, "k").merge(fit_cms(b2, "k"))
    # key 5 is 120/400 = 30% of the STREAM but only 30% of each batch
    # too; a batch-local confirm at stream scale would still pass it —
    # so make the batch-local fraction sub-threshold: key 5 is 60/200
    # = 30% per batch; threshold 25% of stream total (400) = 100 > 60,
    # so a batch-only count would DROP it; the running sketch keeps it
    got = hot_keys_cms(b2, "k", support=0.25, sketch=running, exact=False)
    assert got == [5]
    with pytest.raises(ValueError, match="exact=True"):
        hot_keys_cms(b2, "k", support=0.25, sketch=running)
    with pytest.raises(ValueError, match="support-bounded"):
        hot_keys_cms(b2, "k", support=0.0001, width=64, exact=False)


def test_hot_keys_cms_filters_below_the_distinct_exchange(spark):
    """r12 review fix pin: the estimate filter must run BELOW the
    distinct's exchange so the shuffle carries only threshold-passing
    rows — dedup-then-estimate would exchange the full key
    vocabulary.  Physical plans print parents first, so the (single)
    Exchange must appear before the Filter, which must appear before
    the Arrow estimate eval feeding it."""
    import math

    from pyspark.sql import functions as F

    from smashed_spark.functions.cms import fit_cms, with_cms_estimate

    df = spark.createDataFrame(
        [(i % 50,) for i in range(2000)], "k: bigint"
    )
    sk = fit_cms(df, "k")
    thresh = math.ceil(0.05 * sk.total)
    keyed = df.select(F.col("k").alias("__k__")).where(
        F.col("__k__").isNotNull()
    )
    plan_df = (
        with_cms_estimate(keyed, "__k__", sk, out="__est__")
        .where(F.col("__est__") >= F.lit(thresh))
        .select("__k__")
        .distinct()
    )
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    ex = plan.index("Exchange hashpartitioning")
    fi = plan.index("Filter ")
    ar = plan.index("ArrowEvalPython")
    assert ex < fi < ar, plan
