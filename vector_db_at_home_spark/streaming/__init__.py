from .dedup import dedup_stream, dedup_stream_counts
from .ingest import stream_into_invindex, stream_into_store
from .neardup import stream_into_store_neardup
from .joins import stream_static_enrich, stream_stream_interval_join
from .events import (
    dedup_events_stream,
    events_stream_windowed_counts,
    read_events_stream,
    run_stream_to_memory,
    sessionize,
)

__all__ = [
    "dedup_events_stream",
    "dedup_stream",
    "dedup_stream_counts",
    "events_stream_windowed_counts",
    "read_events_stream",
    "run_stream_to_memory",
    "sessionize",
    "stream_into_invindex",
    "stream_into_store",
    "stream_into_store_neardup",
    "stream_static_enrich",
    "stream_stream_interval_join",
]
