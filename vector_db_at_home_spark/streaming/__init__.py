from .events import (
    events_stream_windowed_counts,
    read_events_stream,
    sessionize,
)

__all__ = [
    "events_stream_windowed_counts",
    "read_events_stream",
    "sessionize",
]
