from .runner import (
    apply_pipeline_stream,
    assert_streamable,
    streamable,
    windowed_event_counts,
)

__all__ = [
    "apply_pipeline_stream",
    "assert_streamable",
    "streamable",
    "windowed_event_counts",
]
