from .events_stream import (
    read_events_stream,
    sessionized_events,
    upsert_keep_latest_batch,
    windowed_event_stats,
)

__all__ = [
    "read_events_stream",
    "windowed_event_stats",
    "sessionized_events",
    "upsert_keep_latest_batch",
]
