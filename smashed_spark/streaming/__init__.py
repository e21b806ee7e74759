from .datasource import SnapshotDataSource, register_snapshot_source
from .ingest import ingest_dedup_batch, streaming_ingest_dedup
from .joins import interval_join, stream_static_enrich
from .snapshot_source import read_snapshot_stream, read_stream_offset
from .snapshot_sink import (
    dedup_snapshot_batch_writer,
    snapshot_batch_writer,
    stream_commit_watermark,
    streaming_dedup_to_snapshot,
    streaming_snapshot_append,
)
from .runner import (
    apply_pipeline_stream,
    assert_streamable,
    streamable,
    windowed_event_counts,
)

__all__ = [
    "SnapshotDataSource",
    "apply_pipeline_stream",
    "assert_streamable",
    "dedup_snapshot_batch_writer",
    "ingest_dedup_batch",
    "interval_join",
    "read_snapshot_stream",
    "read_stream_offset",
    "register_snapshot_source",
    "snapshot_batch_writer",
    "stream_commit_watermark",
    "stream_static_enrich",
    "streamable",
    "streaming_dedup_to_snapshot",
    "streaming_ingest_dedup",
    "streaming_snapshot_append",
    "windowed_event_counts",
]
