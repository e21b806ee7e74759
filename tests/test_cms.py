"""Count-Min sketch (functions/cms.py): bit-exact python + DuckDB
replays, the one-sided error contract, merge algebra, weighted fits,
and the narrow-probe plan shape."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from smashed_spark.functions.cms import (
    CountMinSketch,
    fit_cms,
    load_cms,
    with_cms_estimate,
)

DEPTH, WIDTH, SALT = 4, 256, 7


def _positions(value, depth=DEPTH, width=WIDTH, salt=SALT):
    dig = hashlib.md5(f"{value}:cms:{salt}".encode()).hexdigest()
    h1 = int(dig[0:8], 16)
    h2 = int(dig[8:16], 16) | 1
    return [(h1 + j * h2) % width for j in range(depth)]


def _replay(pairs, depth=DEPTH, width=WIDTH, salt=SALT):
    counts = np.zeros((depth, width), dtype=np.int64)
    for value, w in pairs:
        for j, p in enumerate(_positions(value, depth, width, salt)):
            counts[j, p] += w
    return counts


def _stream():
    # Zipf-ish: key k appears ~200//(k+1) times
    out = []
    for k in range(40):
        out += [(f"key{k}",)] * (200 // (k + 1))
    return out


def test_fit_matches_python_replay(spark):
    df = spark.createDataFrame(_stream(), "k string")
    sk = fit_cms(df, "k", depth=DEPTH, width=WIDTH, salt=SALT)
    want = _replay([(v, 1) for (v,) in _stream()])
    assert (sk.counts == want).all()
    assert sk.total == len(_stream())


def test_never_undercounts_and_error_bound(spark):
    from collections import Counter

    truth = Counter(v for (v,) in _stream())
    df = spark.createDataFrame(_stream(), "k string")
    sk = fit_cms(df, "k", depth=DEPTH, width=WIDTH, salt=SALT)
    n = sum(truth.values())
    for k, c in truth.items():
        est = sk.estimate(k)
        assert est >= c, (k, est, c)  # one-sided, always
        # generous 2x the eps*N bound (eps = e/width)
        assert est - c <= 2 * np.e / WIDTH * n + 1, (k, est, c)


def test_hot_key_candidates_are_a_superset(spark):
    from collections import Counter

    truth = Counter(v for (v,) in _stream())
    df = spark.createDataFrame(_stream(), "k string")
    sk = fit_cms(df, "k", depth=DEPTH, width=WIDTH, salt=SALT)
    threshold = 20
    hot_true = {k for k, c in truth.items() if c >= threshold}
    candidates = {k for k in truth if sk.estimate(k) >= threshold}
    assert hot_true <= candidates  # never-undercount => no misses


def test_merge_equals_fit_on_union(spark):
    rows = _stream()
    a = spark.createDataFrame(rows[::2], "k string")
    b = spark.createDataFrame(rows[1::2], "k string")
    full = fit_cms(
        spark.createDataFrame(rows, "k string"),
        "k", depth=DEPTH, width=WIDTH, salt=SALT,
    )
    merged = fit_cms(a, "k", depth=DEPTH, width=WIDTH, salt=SALT).merge(
        fit_cms(b, "k", depth=DEPTH, width=WIDTH, salt=SALT)
    )
    assert (merged.counts == full.counts).all()
    assert merged.total == full.total
    with pytest.raises(ValueError, match="different"):
        full.merge(CountMinSketch(
            np.zeros((DEPTH, 128)), DEPTH, 128, SALT, 0
        ))


def test_weighted_fit_and_null_semantics(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", None), ("b", 2), (None, 9)],
        "k string, w int",
    )
    sk = fit_cms(df, "k", depth=DEPTH, width=WIDTH, salt=SALT,
                 weight="w")
    assert sk.estimate("a") == 5  # NULL weight contributes 0
    assert sk.estimate("b") == 2
    assert sk.total == 7  # NULL key never counted
    neg = spark.createDataFrame([("a", -1)], "k string, w int")
    with pytest.raises(Exception, match="negative weight"):
        fit_cms(neg, "k", depth=DEPTH, width=WIDTH, weight="w")


def test_duckdb_position_and_count_parity(spark):
    import duckdb

    rows = _stream()[:100]
    df = spark.createDataFrame(rows, "k string")
    sk = fit_cms(df, "k", depth=DEPTH, width=WIDTH, salt=SALT)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (k VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?)", rows)
    got = con.execute(f"""
        WITH h AS (
            SELECT ('0x' || substr(md5(k || ':cms:{SALT}'), 1, 8))
                       ::BIGINT AS h1,
                   (('0x' || substr(md5(k || ':cms:{SALT}'), 9, 8))
                       ::BIGINT | 1) AS h2
            FROM t
        ), jp AS (
            SELECT j, (h1 + j * h2) % {WIDTH} AS p
            FROM h, (SELECT unnest(range({DEPTH})) AS j)
        )
        SELECT j, p, count(*) AS c FROM jp GROUP BY 1, 2
    """).fetchall()
    want = np.zeros((DEPTH, WIDTH), dtype=np.int64)
    for j, p, c in got:
        want[int(j), int(p)] = c
    assert (sk.counts == want).all()


def test_partition_invariance(spark):
    df = spark.createDataFrame(_stream(), "k string")
    a = fit_cms(df.repartition(1), "k", depth=DEPTH, width=WIDTH,
                salt=SALT)
    b = fit_cms(df.repartition(7, "k"), "k", depth=DEPTH, width=WIDTH,
                salt=SALT)
    assert (a.counts == b.counts).all()


def test_with_cms_estimate_column(spark):
    rows = _stream()
    df = spark.createDataFrame(rows, "k string")
    sk = fit_cms(df, "k", depth=DEPTH, width=WIDTH, salt=SALT)
    probe = spark.createDataFrame(
        [("key0",), ("key39",), (None,), ("unseen",)], "k string"
    )
    out = {
        r["k"]: r["cms_count"]
        for r in with_cms_estimate(probe, "k", sk).collect()
    }
    assert out["key0"] == sk.estimate("key0")
    assert out["key39"] == sk.estimate("key39")
    assert out[None] is None
    assert out["unseen"] >= 0
    with pytest.raises(ValueError, match="already exists"):
        with_cms_estimate(probe, "k", sk, out="k")
    # narrow probe: no exchange anywhere — position math is JVM-side,
    # the gather is one Arrow stage
    est = with_cms_estimate(probe, "k", sk)
    plan = est._sc._jvm.PythonSQLUtils.explainString(
        est._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan.split("\n\n")[0], plan


def test_estimate_key_rendering_matches_spark_cast(spark):
    # int and bool keys must consult the SAME counters the fit wrote
    # via CAST(col AS STRING); floats are refused (Java
    # Double.toString has no reliable Python replica)
    df = spark.createDataFrame(
        [(7,), (7,), (None,)], "k bigint"
    )
    sk = fit_cms(df, "k", depth=DEPTH, width=WIDTH, salt=SALT)
    assert sk.estimate(7) == 2
    bdf = spark.createDataFrame([(True,), (True,), (False,)], "k boolean")
    bsk = fit_cms(bdf, "k", depth=DEPTH, width=WIDTH, salt=SALT)
    assert bsk.estimate(True) == 2
    assert bsk.estimate(False) == 1
    with pytest.raises(TypeError, match="portably"):
        sk.estimate(1.5)


def test_geometry_validation_and_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="depth"):
        fit_cms(df, "k", depth=0, width=8)
    with pytest.raises(ValueError, match="width"):
        fit_cms(df, "k", depth=4, width=1 << 30)
    sk = fit_cms(df, "k", depth=DEPTH, width=WIDTH, salt=SALT)
    sk.save(str(tmp_path / "cms"))
    back = load_cms(str(tmp_path / "cms"))
    assert (back.counts == sk.counts).all()
    assert (back.depth, back.width, back.salt, back.total) == (
        sk.depth, sk.width, sk.salt, sk.total,
    )
