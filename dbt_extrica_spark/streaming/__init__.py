from .incremental import (
    read_event_stream, windowed_counts, run_available_now,
    sessionize_stateful, streaming_incremental_merge,
)

__all__ = [
    "read_event_stream", "windowed_counts", "run_available_now",
    "sessionize_stateful", "streaming_incremental_merge",
]
