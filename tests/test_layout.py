"""sources/layout.py — Z-order clustering, footer audit, compaction,
partition transforms, provenance reads."""

import hashlib
import math
import os
import random
import shutil

import pytest
from pyspark.sql import functions as F

from smashed_spark.sources.layout import (
    bucket_by_md5,
    compact_dataset,
    days,
    fit_zorder_bounds,
    hours,
    optimize_layout,
    read_with_provenance,
    recover_compaction_swap,
    scan_stats,
    skip_fraction,
    zorder_column,
    zorder_sql,
)


# -- reference replay ------------------------------------------------------


def _rank_exact(v, lo, hi, bits):
    m = (1 << bits) - 1
    if hi == lo:
        return 0
    return min(max((int(v) - int(lo)) * m // (int(hi) - int(lo)), 0), m)


def _rank_double(v, lo, hi, bits):
    m = (1 << bits) - 1
    if hi == lo:
        return 0
    return min(
        max(int(math.floor((float(v) - float(lo)) / (float(hi) - float(lo))
                           * m)), 0), m
    )


def _interleave(ranks, bits):
    z, n = 0, len(ranks)
    for i in range(bits):
        for j, r in enumerate(ranks):
            z |= ((int(r) >> i) & 1) << (i * n + j)
    return z


def _zorder_ref(x, y, bounds, bits):
    lo_x, hi_x = bounds["x"]
    lo_y, hi_y = bounds["y"]
    rx = (
        _rank_exact(x, lo_x, hi_x, bits)
        if isinstance(lo_x, int)
        else _rank_double(x, lo_x, hi_x, bits)
    )
    ry = (
        _rank_exact(y, lo_y, hi_y, bits)
        if isinstance(lo_y, int)
        else _rank_double(y, lo_y, hi_y, bits)
    )
    return _interleave([rx, ry], bits)


def _mixed_frame(spark, n=500, seed=11):
    rng = random.Random(seed)
    rows = [
        (i, rng.randint(-(10**9), 10**12), rng.random() * 37.5 - 5.0)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id bigint, x bigint, y double")


# -- Z-key math ------------------------------------------------------------


def test_zorder_three_way_bit_equality(spark):
    """Spark == DuckDB == Python, exact tier (int bounds) and double
    tier (float bounds) together, bits=8."""
    import duckdb

    df = _mixed_frame(spark)
    bounds = fit_zorder_bounds(df, ["x", "y"])
    assert isinstance(bounds["x"][0], int)
    assert isinstance(bounds["y"][0], float)

    got = (
        df.withColumn("z", zorder_column(df, ["x", "y"], bounds, bits=8))
        .orderBy("id")
        .collect()
    )
    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    expr = zorder_sql(["x", "y"], bounds, bits=8)
    oracle = con.sql(f"SELECT id, {expr} AS z FROM t ORDER BY id").fetchall()
    for row, (oid, oz) in zip(got, oracle):
        assert row["id"] == oid
        assert row["z"] == oz, f"duckdb mismatch id={oid}"
        assert row["z"] == _zorder_ref(row["x"], row["y"], bounds, 8), (
            f"python mismatch id={oid}"
        )


def test_zorder_rank_extremes_and_clamp(spark):
    """min maps to rank 0, max to 2^bits - 1 (exact tier is entitled
    to both ends); explicit narrower bounds clamp instead of
    overflowing the bit budget."""
    df = spark.createDataFrame(
        [(0, 0.0), (50, 50.0), (100, 100.0)], "x bigint, y double"
    )
    bounds = {"x": (0, 100), "y": (0.0, 100.0)}
    rows = {
        r["x"]: r["z"]
        for r in df.withColumn(
            "z", zorder_column(df, ["x", "y"], bounds, bits=4)
        ).collect()
    }
    assert rows[0] == 0
    assert rows[100] == _interleave([15, 15], 4)
    narrow = {"x": (40, 60), "y": (40.0, 60.0)}
    clamped = {
        r["x"]: r["z"]
        for r in df.withColumn(
            "z", zorder_column(df, ["x", "y"], narrow, bits=4)
        ).collect()
    }
    assert clamped[0] == 0  # below both ranges -> rank 0
    assert clamped[100] == _interleave([15, 15], 4)  # above -> max rank


def test_zorder_null_propagates(spark):
    df = spark.createDataFrame(
        [(1, 5, 1.0), (2, None, 1.0)], "id bigint, x bigint, y double"
    )
    got = {
        r["id"]: r["z"]
        for r in df.withColumn(
            "z",
            zorder_column(df, ["x", "y"], {"x": (0, 10), "y": (0.0, 2.0)}, 4),
        ).collect()
    }
    assert got[1] is not None and got[2] is None


def test_zorder_degenerate_dimension(spark):
    """hi == lo (constant column) contributes rank 0 everywhere."""
    df = spark.createDataFrame([(7, 3), (7, 9)], "x bigint, w bigint")
    got = [
        r["z"]
        for r in df.withColumn(
            "z", zorder_column(df, ["x", "w"], {"x": (7, 7), "w": (3, 9)}, 4)
        ).collect()
    ]
    ref = [
        _interleave([0, _rank_exact(w, 3, 9, 4)], 4) for w in (3, 9)
    ]
    assert sorted(got) == sorted(ref)


def test_zorder_validation_raises(spark):
    df = _mixed_frame(spark, n=5)
    with pytest.raises(ValueError, match="62"):
        zorder_column(df, ["x", "y"], {"x": (0, 1), "y": (0.0, 1.0)}, 32)
    # mixed-type bounds (one end floatified, e.g. by a JSON round-trip
    # of a persisted bounds report) must raise, not silently flip the
    # exact tier to the double tier and break append-stability
    with pytest.raises(ValueError, match="mixed int/float"):
        zorder_column(df, ["x"], {"x": (0, 1000.0)}, 8)
    with pytest.raises(ValueError, match="mixed int/float"):
        zorder_column(df, ["x"], {"x": (0.0, 1000)}, 8)
    with pytest.raises(ValueError, match="reversed"):
        zorder_column(df, ["x"], {"x": (10, 0)}, 8)
    with pytest.raises(ValueError, match="no bounds"):
        zorder_column(df, ["x", "y"], {"x": (0, 1)}, 8)
    with pytest.raises(ValueError, match="at least one"):
        zorder_column(df, [], {}, 8)
    with pytest.raises(ValueError, match="bits"):
        zorder_column(df, ["x"], {"x": (0, 1)}, 0)
    all_null = spark.createDataFrame([(None,), (None,)], "x int")
    with pytest.raises(ValueError, match="entirely NULL"):
        fit_zorder_bounds(all_null, ["x"])


def test_zorder_append_stable(spark):
    """Same explicit bounds => identical keys on a disjoint later
    batch — the property that lets appends share a layout."""
    bounds = {"x": (0, 1000)}
    a = spark.createDataFrame([(i,) for i in range(0, 100)], "x bigint")
    b = spark.createDataFrame([(i,) for i in range(0, 100)], "x bigint")
    za = [r["z"] for r in a.withColumn(
        "z", zorder_column(a, ["x"], bounds, 10)).orderBy("x").collect()]
    zb = [r["z"] for r in b.withColumn(
        "z", zorder_column(b, ["x"], bounds, 10)).orderBy("x").collect()]
    assert za == zb
    # single-dimension key is monotone in the value
    assert za == sorted(za)


def test_zorder_plan_is_narrow(spark):
    """The key is pure Catalyst: no Python evaluation node, no
    exchange introduced by the withColumn itself."""
    df = _mixed_frame(spark, n=50)
    bounds = fit_zorder_bounds(df, ["x", "y"])
    plan = (
        df.withColumn("z", zorder_column(df, ["x", "y"], bounds, 16))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


# -- clustered write + footer audit ----------------------------------------


@pytest.fixture()
def layout_dirs(tmp_path):
    return str(tmp_path / "zorder"), str(tmp_path / "random")


def test_optimize_layout_beats_random_on_both_dims(spark, layout_dirs):
    zp, rp = layout_dirs
    rng = random.Random(3)
    rows = [
        (i, rng.randint(0, 1 << 20), float(rng.randint(0, 1 << 20)))
        for i in range(20000)
    ]
    df = spark.createDataFrame(rows, "id bigint, x bigint, y double")
    report = optimize_layout(df, zp, ["x", "y"], bits=10, num_files=16)
    assert report["num_files"] == 16
    df.repartition(16).write.parquet(rp)

    # roundtrip equality (layout must never change the data)
    back = spark.read.parquet(zp)
    assert back.columns == ["id", "x", "y"]
    assert (
        back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0
    )

    sz = scan_stats(spark, zp, ["x", "y"])
    sr = scan_stats(spark, rp, ["x", "y"])
    lo, hi = 0, (1 << 20) // 10  # a 10% range predicate
    fz_x = skip_fraction(sz, "x", lower=lo, upper=hi)
    fr_x = skip_fraction(sr, "x", lower=lo, upper=hi)
    fz_y = skip_fraction(sz, "y", lower=float(lo), upper=float(hi))
    assert fr_x["row_skip_fraction"] == 0.0
    assert fz_x["row_skip_fraction"] > 0.5
    assert fz_y["row_skip_fraction"] > 0.5


def test_optimize_layout_append_with_pinned_bounds(spark, tmp_path):
    """The append story: a second batch written with the FIRST
    write's bounds lands in the same dataset with keys computed
    identically (append-stable), and the footer audit still prunes
    across the combined file set."""
    path = str(tmp_path / "appended")
    b1 = spark.createDataFrame(
        [(i, i * 7 % 1000) for i in range(0, 2000)], "id bigint, x bigint"
    )
    b2 = spark.createDataFrame(
        [(i, i * 7 % 1000) for i in range(2000, 4000)], "id bigint, x bigint"
    )
    rep = optimize_layout(
        b1, path, ["x"], bits=10, num_files=4,
        keep_zorder_column=True,
    )
    optimize_layout(
        b2, path, ["x"], bits=10, num_files=4,
        bounds=rep["bounds"], keep_zorder_column=True, mode="append",
    )
    back = spark.read.parquet(path)
    assert back.count() == 4000
    # identical x => identical zkey across batches (append-stability)
    dup_keys = (
        back.groupBy("x")
        .agg(F.countDistinct("zkey").alias("d"))
        .filter("d > 1")
        .count()
    )
    assert dup_keys == 0
    f = skip_fraction(
        scan_stats(spark, path, ["x"]), "x", lower=0, upper=99
    )
    assert f["row_skip_fraction"] > 0.5


def test_scan_stats_no_false_skips(spark, tmp_path):
    """Every row group skip_fraction claims skippable truly contains
    no matching row — checked against the actual row-group contents
    via pyarrow."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "ds")
    rng = random.Random(5)
    df = spark.createDataFrame(
        [(i, rng.randint(0, 10000)) for i in range(5000)],
        "id bigint, x bigint",
    )
    optimize_layout(df, path, ["x"], bits=8, num_files=8)
    stats = scan_stats(spark, path, ["x"]).collect()
    lo, hi = 2000, 3000
    for r in stats:
        skippable = r["has_stats"] and (
            r["max_double"] < lo or r["min_double"] > hi
        )
        if skippable:
            fp = r["file"].replace("file:", "")
            tbl = pq.ParquetFile(fp).read_row_group(
                r["row_group"], columns=["x"]
            )
            xs = tbl.column("x").to_pylist()
            assert not any(lo <= v <= hi for v in xs), (
                f"false skip in {fp} rg {r['row_group']}"
            )


def test_skip_fraction_string_bounds(spark, tmp_path):
    path = str(tmp_path / "s")
    df = spark.createDataFrame(
        [(c * 3,) for c in "abcdefgh" for _ in range(10)], "s string"
    )
    # one file per letter via repartitionByRange on the string itself
    df.repartitionByRange(8, "s").write.parquet(path)
    st = scan_stats(spark, path, ["s"])
    f = skip_fraction(st, "s", lower_str="bbb", upper_str="ccc")
    assert f["row_skip_fraction"] > 0.5
    with pytest.raises(ValueError, match="exclusive"):
        skip_fraction(st, "s", lower=1, lower_str="a")
    with pytest.raises(ValueError, match="at least one bound"):
        skip_fraction(st, "s")


def test_scan_stats_huge_int64_envelope_is_conservative(spark, tmp_path):
    """int64 stats above 2^53 round when cast to double; the envelope
    must widen OUTWARD (min down, max up) so a boundary predicate can
    never manufacture a false skip."""
    path = str(tmp_path / "big")
    lo_true = (1 << 53) + 3   # not double-representable (rounds UP)
    hi_true = (1 << 60) + 1   # rounds DOWN as a double
    df = spark.createDataFrame(
        [(lo_true,), (hi_true,)], "x bigint"
    ).coalesce(1)
    df.write.parquet(path)
    st = scan_stats(spark, path, ["x"]).collect()
    assert len(st) == 1
    r = st[0]
    assert r["min_double"] <= lo_true
    assert r["max_double"] >= hi_true
    # the exact-boundary predicate that naive float() rounding skips
    f = skip_fraction(
        scan_stats(spark, path, ["x"]), "x",
        lower=float(0), upper=float(lo_true),
    )
    assert f["skipped_row_groups"] == 0


def test_optimize_layout_zkey_collision_raises(spark, tmp_path):
    """Re-clustering a dataset written with keep_zorder_column=True
    must not silently overwrite (then drop) the existing key column."""
    path = str(tmp_path / "z1")
    df = spark.createDataFrame([(i, i * 2) for i in range(50)],
                               "a bigint, b bigint")
    optimize_layout(df, path, ["a"], bits=8, num_files=2,
                    keep_zorder_column=True)
    back = spark.read.parquet(path)
    assert "zkey" in back.columns
    with pytest.raises(ValueError, match="zkey"):
        optimize_layout(back, str(tmp_path / "z2"), ["a"], bits=8)
    # an explicit fresh name works
    optimize_layout(back, str(tmp_path / "z3"), ["a"], bits=8,
                    num_files=2, zorder_field="zkey2")


def test_skip_fraction_missing_stats_conservative(spark):
    """has_stats=false row groups are never counted skippable."""
    st = spark.createDataFrame(
        [
            ("f", 0, 10, 100, "x", None, False, None, None, None, None),
            ("f", 1, 10, 100, "x", 0, True, 0.0, 1.0, "0", "1"),
        ],
        "file string, row_group int, num_rows bigint, compressed_bytes "
        "bigint, col string, null_count bigint, has_stats boolean, "
        "min_double double, max_double double, min_str string, "
        "max_str string",
    )
    f = skip_fraction(st, "x", lower=5.0, upper=6.0)
    # only the stats-bearing group may be skipped
    assert f["skipped_row_groups"] == 1 and f["row_groups"] == 2


# -- partition transforms ---------------------------------------------------


def test_partition_transforms_prune_and_replay(spark, tmp_path):
    path = str(tmp_path / "pt")
    ev = spark.createDataFrame(
        [
            (i, f"2024-01-0{1 + i % 3} 0{i % 10}:30:00", f"user{i % 7}")
            for i in range(120)
        ],
        "id bigint, ts string, u string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    optimize_layout(
        ev,
        path,
        ["id"],
        bits=8,
        num_files=4,
        partition_transforms={
            "day": days("ts"),
            "bkt": bucket_by_md5("u", 4),
        },
    )
    got = spark.read.parquet(path).filter("day = '2024-01-02'")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan
    assert got.count() == 40

    # bucket assignment replays in python (portable md5-60 convention)
    def bkt_ref(s, n):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % n

    rows = spark.read.parquet(path).select("u", "bkt").distinct().collect()
    for r in rows:
        assert r["bkt"] == bkt_ref(r["u"], 4)

    with pytest.raises(ValueError, match="collides"):
        optimize_layout(
            ev,
            str(tmp_path / "pt2"),
            ["id"],
            partition_transforms={"u": days("ts")},
        )
    with pytest.raises(ValueError, match="n must be"):
        bucket_by_md5("u", 0)


def test_hours_transform(spark):
    df = spark.createDataFrame(
        [("2024-03-05 07:59:59",), ("2024-03-05 08:00:00",)], "ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = sorted(r[0] for r in df.select(hours("ts")).collect())
    assert got == ["2024-03-05-07", "2024-03-05-08"]


# -- compaction --------------------------------------------------------------


def test_compact_dataset_packs_and_preserves(spark, tmp_path):
    path = str(tmp_path / "pile")
    df = spark.createDataFrame(
        [(i, float(i) / 7) for i in range(20000)], "id bigint, v double"
    )
    df.repartition(120).write.parquet(path)
    prev_max = spark.conf.get("spark.sql.files.maxPartitionBytes")
    report = compact_dataset(spark, path, target_file_bytes=1 << 20)
    assert report["files_before"] == 120
    assert report["files_after"] < 10
    back = spark.read.parquet(path)
    assert back.count() == 20000
    assert back.agg(F.sum("id")).first()[0] == sum(range(20000))
    # confs restored (set-or-unset both handled)
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == prev_max


def test_compact_refusals(spark, tmp_path):
    with pytest.raises(ValueError, match="atomic"):
        compact_dataset(spark, "s3://bucket/pile")
    part = str(tmp_path / "hive")
    spark.createDataFrame([(1, "a")], "id bigint, p string").write.partitionBy(
        "p"
    ).parquet(part)
    with pytest.raises(ValueError, match="hive-partitioned"):
        compact_dataset(spark, part)
    with pytest.raises(ValueError, match="not a directory"):
        compact_dataset(spark, str(tmp_path / "missing"))


def test_compact_crash_recovery(spark, tmp_path):
    """Simulate the one crash window: staging complete (_SUCCESS) and
    the original already removed — recovery finishes the rename, both
    via the explicit entry point and via compact_dataset itself."""
    path = str(tmp_path / "ds")
    df = spark.createDataFrame([(i,) for i in range(100)], "id bigint")
    df.repartition(5).write.parquet(path)
    staging = os.path.join(
        str(tmp_path), ".ds.__compact_staging__"
    )
    # build a complete staging snapshot, then "crash" post-remove
    spark.read.parquet(path).coalesce(1).write.parquet(staging)
    assert os.path.isfile(os.path.join(staging, "_SUCCESS"))
    shutil.rmtree(path)
    assert recover_compaction_swap(path) is True
    assert spark.read.parquet(path).count() == 100
    assert not os.path.exists(staging)
    # idempotent: nothing to do now
    assert recover_compaction_swap(path) is False

    # same window repaired implicitly at compact entry
    df.repartition(5).write.mode("overwrite").parquet(path)
    spark.read.parquet(path).coalesce(1).write.mode("overwrite").parquet(
        staging
    )
    shutil.rmtree(path)
    report = compact_dataset(spark, path, target_file_bytes=1 << 20)
    assert spark.read.parquet(path).count() == 100
    assert report["files_after"] >= 1


# -- provenance ---------------------------------------------------------------


def test_read_with_provenance(spark, tmp_path):
    path = str(tmp_path / "prov")
    df = spark.createDataFrame([(i,) for i in range(1000)], "id bigint")
    df.repartition(4).write.parquet(path)
    pv = read_with_provenance(spark, path, include_path=True)
    assert {"prov_file", "prov_row_index", "prov_path"} <= set(pv.columns)
    # row_index is 0..n-1 within each file, so (file, row_index) is a
    # total row identity
    per_file = (
        pv.groupBy("prov_file")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("prov_row_index").alias("d"),
            F.min("prov_row_index").alias("lo"),
            F.max("prov_row_index").alias("hi"),
        )
        .collect()
    )
    assert len(per_file) == 4
    for r in per_file:
        assert r["d"] == r["n"] and r["lo"] == 0 and r["hi"] == r["n"] - 1
    assert pv.count() == 1000
    # deterministic across re-reads
    a = {(r["prov_file"], r["prov_row_index"], r["id"]) for r in pv.collect()}
    b = {
        (r["prov_file"], r["prov_row_index"], r["id"])
        for r in read_with_provenance(
            spark, path, include_path=True
        ).collect()
    }
    assert a == b
