"""Exactly-once streaming appends into a snapshot table
(streaming/snapshot_sink.py): real Structured Streaming lifecycle,
replayed-batch idempotence, the crash-before-pointer window, and the
watermark surviving maintenance rewrites + vacuum.
"""

import os

import pytest

import smashed_spark.sources.snapshot as snap
from smashed_spark.sources.snapshot import (
    compact_snapshot,
    list_snapshots,
    read_snapshot,
    read_snapshot_changes,
    resolve_snapshot,
    vacuum_snapshots,
)
from smashed_spark.streaming.snapshot_sink import (
    snapshot_batch_writer,
    stream_commit_watermark,
    streaming_snapshot_append,
)


def _df(spark, lo, hi, tag="a"):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(tag + "_"), F.col("id")).alias("text"),
    )


def _ids(df):
    return sorted(r.doc_id for r in df.collect())


def test_streaming_append_lifecycle(spark, tmp_path):
    """Three files arrive one per micro-batch; each commits as one
    snapshot version (publish, then appends) and the incremental read
    sees exactly the post-base batches."""
    src = str(tmp_path / "src")
    for i in range(3):
        _df(spark, i * 10, i * 10 + 10).coalesce(1).write.parquet(
            f"{src}/f{i}"
        )
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    root = str(tmp_path / "table")
    q = streaming_snapshot_append(
        stream,
        root,
        checkpoint_dir=str(tmp_path / "ckpt"),
        app_id="app1",
        query_name="snap_sink_test",
        stats_columns=["doc_id"],
    )
    q.awaitTermination(180)
    assert not q.isActive
    assert list_snapshots(root) == [1, 2, 3]
    infos = [resolve_snapshot(root, v) for v in (1, 2, 3)]
    assert [i.operation for i in infos] == ["publish", "append", "append"]
    assert stream_commit_watermark(root) == ("app1", 2)
    assert _ids(read_snapshot(spark, root)) == list(range(30))
    # incremental consumers see only the appended batches
    changed = _ids(read_snapshot_changes(spark, root, since_version=1))
    assert len(changed) == 20 and min(changed) >= 10
    # per-file envelope stats rode along
    assert "stats" in resolve_snapshot(root).files[0]


def test_replayed_batch_is_skipped(spark, tmp_path):
    root = str(tmp_path / "table")
    commits = []
    body = snapshot_batch_writer(root, "app1", on_commit=commits.append)
    body(_df(spark, 0, 10), 0)
    body(_df(spark, 10, 20), 1)
    body(_df(spark, 10, 20), 1)  # at-least-once redelivery
    body(_df(spark, 0, 20), 0)  # stale replay from an old offset
    assert [c["skipped"] for c in commits] == [False, False, True, True]
    assert list_snapshots(root) == [1, 2]
    assert resolve_snapshot(root).row_count == 20
    assert _ids(read_snapshot(spark, root)) == list(range(20))


def test_crash_before_pointer_then_replay(spark, tmp_path, monkeypatch):
    """A batch whose pointer flip never lands is NOT committed: the
    replay re-appends, no rows duplicate, and the debris vacuums."""
    root = str(tmp_path / "table")
    body = snapshot_batch_writer(root, "app1")
    body(_df(spark, 0, 10), 0)

    real = snap._write_atomic

    def boom(path, payload, client=None):
        if path.endswith(snap.POINTER_NAME):
            raise RuntimeError("simulated crash before pointer")
        return real(path, payload, client=client)

    monkeypatch.setattr(snap, "_write_atomic", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        body(_df(spark, 10, 20), 1)
    monkeypatch.undo()

    assert stream_commit_watermark(root) == ("app1", 0)
    body(_df(spark, 10, 20), 1)  # Structured Streaming replays the id
    assert stream_commit_watermark(root) == ("app1", 1)
    assert _ids(read_snapshot(spark, root)) == list(range(20))
    report = vacuum_snapshots(root, keep_last=5, drop_unpublished=True)
    assert report["dropped_versions"] == [2]  # the orphan manifest


def test_watermark_survives_compaction_and_vacuum(spark, tmp_path):
    root = str(tmp_path / "table")
    body = snapshot_batch_writer(root, "app1")
    body(_df(spark, 0, 10), 0)
    body(_df(spark, 10, 20), 1)
    compact_snapshot(spark, root)
    vacuum_snapshots(root, keep_last=1)  # the stream manifests are GONE
    assert list_snapshots(root) == [3]
    assert stream_commit_watermark(root) == ("app1", 1)
    commits = []
    body = snapshot_batch_writer(root, "app1", on_commit=commits.append)
    body(_df(spark, 10, 20), 1)  # replay across the rewrite: still a no-op
    assert commits[-1]["skipped"] is True
    body(_df(spark, 20, 30), 2)
    assert commits[-1]["skipped"] is False
    assert _ids(read_snapshot(spark, root)) == list(range(30))


def test_app_mismatch_raises_and_takeover(spark, tmp_path):
    root = str(tmp_path / "table")
    snapshot_batch_writer(root, "app1")(_df(spark, 0, 10), 5)
    other = snapshot_batch_writer(root, "app2")
    with pytest.raises(RuntimeError, match="stream app 'app1'"):
        other(_df(spark, 10, 20), 0)
    # takeover: batch ids restart for the new checkpoint
    taken = snapshot_batch_writer(root, "app2", takeover=True)
    taken(_df(spark, 10, 20), 0)
    assert stream_commit_watermark(root) == ("app2", 0)
    assert _ids(read_snapshot(spark, root)) == list(range(20))


def test_streaming_requires_streaming_df(spark, tmp_path):
    with pytest.raises(ValueError, match="needs a streaming DataFrame"):
        streaming_snapshot_append(
            _df(spark, 0, 5), str(tmp_path / "t"), str(tmp_path / "c"), "a"
        )


def test_restart_with_new_checkpoint_same_app_resumes(spark, tmp_path):
    """The operational restart: same app_id, fresh checkpoint whose
    batch ids restart at 0 — ids at or below the recorded watermark
    are treated as replays (documented contract: app_id identifies the
    LOGICAL stream, so a fresh checkpoint for the same app must seed
    past data only beyond the watermark)."""
    root = str(tmp_path / "table")
    body = snapshot_batch_writer(root, "app1")
    body(_df(spark, 0, 10), 0)
    body(_df(spark, 10, 20), 1)
    commits = []
    resumed = snapshot_batch_writer(root, "app1", on_commit=commits.append)
    resumed(_df(spark, 0, 10), 0)
    resumed(_df(spark, 10, 20), 1)
    resumed(_df(spark, 20, 30), 2)
    assert [c["skipped"] for c in commits] == [True, True, False]
    assert _ids(read_snapshot(spark, root)) == list(range(30))
    assert os.path.isfile(os.path.join(root, snap.POINTER_NAME))
