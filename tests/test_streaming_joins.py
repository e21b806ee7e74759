"""streaming/joins.py — watermarked stream-stream interval joins."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from smashed_spark.streaming.joins import interval_join, stream_static_enrich
from smashed_spark.streaming.runner import drain_bounded

D = datetime

IMP_SCHEMA = "imp_id bigint, user bigint, ts timestamp"
CLK_SCHEMA = "clk_id bigint, user bigint, right_ts timestamp"

IMPRESSIONS = [
    (1, 100, D(2024, 1, 1, 10, 0)),
    (2, 100, D(2024, 1, 1, 11, 0)),
    (3, 200, D(2024, 1, 1, 10, 30)),
    (4, 300, D(2024, 1, 1, 10, 0)),  # never clicked
]
CLICKS = [
    (11, 100, D(2024, 1, 1, 10, 5)),   # matches imp 1 (+5m)
    (12, 100, D(2024, 1, 1, 11, 20)),  # matches imp 2 (+20m? window 15m: NO)
    (13, 200, D(2024, 1, 1, 10, 29)),  # before imp 3 -> only with before>0
    (14, 900, D(2024, 1, 1, 10, 0)),   # unknown user
]


def _batch_frames(spark):
    return (
        spark.createDataFrame(IMPRESSIONS, IMP_SCHEMA),
        spark.createDataFrame(CLICKS, CLK_SCHEMA),
    )


def test_interval_join_batch_semantics(spark):
    imps, clks = _batch_frames(spark)
    got = {
        (r.imp_id, r.clk_id)
        for r in interval_join(
            imps, clks, on="user", left_ts="ts",
            before="0 seconds", after="15 minutes",
        ).collect()
    }
    assert got == {(1, 11)}
    # widening the window picks up the +20m click
    got2 = {
        (r.imp_id, r.clk_id)
        for r in interval_join(
            imps, clks, on="user", after="30 minutes"
        ).collect()
    }
    assert got2 == {(1, 11), (2, 12)}
    # before= admits the click 1 minute BEFORE the impression
    got3 = {
        (r.imp_id, r.clk_id)
        for r in interval_join(
            imps, clks, on="user", before="2 minutes", after="15 minutes"
        ).collect()
    }
    assert got3 == {(1, 11), (3, 13)}
    # both ends inclusive
    edge = {
        (r.imp_id, r.clk_id)
        for r in interval_join(
            imps, clks, on="user", before="0 seconds", after="5 minutes"
        ).collect()
    }
    assert edge == {(1, 11)}


def test_interval_join_left_outer_batch(spark):
    imps, clks = _batch_frames(spark)
    rows = interval_join(
        imps, clks, on="user", after="15 minutes", how="left_outer"
    ).collect()
    by_imp = {}
    for r in rows:
        by_imp.setdefault(r.imp_id, set()).add(r.clk_id)
    assert by_imp[1] == {11}
    assert by_imp[2] == {None} and by_imp[3] == {None} and by_imp[4] == {None}
    # key survives on right-only rows too (full outer)
    full = interval_join(
        imps, clks, on="user", after="15 minutes", how="full_outer"
    )
    right_only = [r for r in full.collect() if r.imp_id is None]
    assert {r.clk_id for r in right_only} == {12, 13, 14}
    assert all(r.user is not None for r in right_only)


def test_interval_join_validation(spark):
    imps, clks = _batch_frames(spark)
    with pytest.raises(ValueError, match="must differ"):
        interval_join(imps, imps, on="user", left_ts="ts", right_ts="ts")
    with pytest.raises(ValueError, match="collide"):
        interval_join(
            imps,
            clks.withColumnRenamed("clk_id", "imp_id"),
            on="user",
        )
    with pytest.raises(ValueError, match="missing from right"):
        interval_join(imps, clks, on="imp_id")
    with pytest.raises(ValueError, match="how="):
        interval_join(imps, clks, on="user", how="left_semi")
    with pytest.raises(ValueError, match="at least one"):
        interval_join(imps, clks, on=[])
    with pytest.raises(TypeError, match="not a timestamp"):
        interval_join(
            imps.withColumn("ts", F.col("ts").cast("string")),
            clks,
            on="user",
        )


def test_interval_join_streaming_equals_batch(spark, tmp_path):
    """Bounded two-stream replay through the REAL stream-stream join
    (watermarks + interval condition) equals the batch join."""
    limps = str(tmp_path / "imps")
    lclks = str(tmp_path / "clks")
    spark.createDataFrame(IMPRESSIONS, IMP_SCHEMA).coalesce(1).write.parquet(
        limps
    )
    spark.createDataFrame(CLICKS, CLK_SCHEMA).coalesce(1).write.parquet(
        lclks
    )
    s_imps = spark.readStream.schema(IMP_SCHEMA).parquet(limps)
    s_clks = spark.readStream.schema(CLK_SCHEMA).parquet(lclks)
    out = interval_join(
        s_imps, s_clks, on="user", after="30 minutes",
        left_watermark="1 hour", right_watermark="1 hour",
    )
    assert out.isStreaming
    drain_bounded(out, "ij_stream_test")
    got = {
        (r.imp_id, r.clk_id)
        for r in spark.table("ij_stream_test").collect()
    }
    imps, clks = _batch_frames(spark)
    want = {
        (r.imp_id, r.clk_id)
        for r in interval_join(
            imps, clks, on="user", after="30 minutes"
        ).collect()
    }
    assert got == want == {(1, 11), (2, 12)}


def test_interval_join_streaming_left_outer_emits_unmatched(
    spark, tmp_path
):
    """Outer rows emit once the watermark closes their interval: a
    multi-micro-batch replay (maxFilesPerTrigger=1) where a late
    sentinel batch advances the watermark far past every interval —
    the never-clicked impression must surface with NULL click."""
    import os

    limps = str(tmp_path / "imps")
    lclks = str(tmp_path / "clks")
    os.makedirs(limps)
    spark.createDataFrame(IMPRESSIONS, IMP_SCHEMA).coalesce(1).write.parquet(
        limps + "/f1"
    )
    # sentinel impressions far in the future, in LATER micro-batches:
    # watermark advance becomes effective one batch later, so give it
    # two batches to propagate
    for i, hour in enumerate((5, 9), start=2):
        spark.createDataFrame(
            [(90 + i, 999, D(2024, 1, 2, hour, 0))], IMP_SCHEMA
        ).coalesce(1).write.parquet(limps + f"/f{i}")
    # the GLOBAL watermark is the min over both streams, so the click
    # stream needs its own future sentinel or it pins the watermark at
    # its last real event and no later interval ever closes
    spark.createDataFrame(
        CLICKS + [(99, 999, D(2024, 1, 2, 12, 0))], CLK_SCHEMA
    ).coalesce(1).write.parquet(lclks)
    s_imps = (
        spark.readStream.schema(IMP_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(limps + "/*")
    )
    s_clks = spark.readStream.schema(CLK_SCHEMA).parquet(lclks)
    out = interval_join(
        s_imps, s_clks, on="user", after="15 minutes",
        left_watermark="10 minutes", right_watermark="10 minutes",
        how="left_outer",
    )
    drain_bounded(out, "ij_outer_test")
    rows = spark.table("ij_outer_test").collect()
    matched = {(r.imp_id, r.clk_id) for r in rows if r.clk_id is not None}
    unmatched = {r.imp_id for r in rows if r.clk_id is None}
    assert matched == {(1, 11)}
    # every closed-and-unmatched impression emitted exactly once
    assert {2, 3, 4} <= unmatched
    assert len([r for r in rows if r.clk_id is None and r.imp_id in
                (2, 3, 4)]) == 3


def test_stream_static_enrich(spark, tmp_path):
    src = str(tmp_path / "ev")
    spark.createDataFrame(IMPRESSIONS, IMP_SCHEMA).coalesce(1).write.parquet(
        src
    )
    dim = spark.createDataFrame(
        [(100, "paid"), (200, "organic")], "user bigint, channel string"
    )
    stream = spark.readStream.schema(IMP_SCHEMA).parquet(src)
    out = stream_static_enrich(stream, dim, on="user")
    assert out.isStreaming
    drain_bounded(out, "enrich_test")
    got = {
        (r.imp_id, r.channel) for r in spark.table("enrich_test").collect()
    }
    assert got == {
        (1, "paid"), (2, "paid"), (3, "organic"), (4, None)
    }
    with pytest.raises(ValueError, match="inner.*left|left.*inner"):
        stream_static_enrich(stream, dim, on="user", how="full_outer")
    # non-key collisions raise here too (same stance as interval_join)
    with pytest.raises(ValueError, match="collide"):
        stream_static_enrich(
            stream, dim.withColumnRenamed("channel", "ts"), on="user"
        )
