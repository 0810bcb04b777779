from .jobs import (  # noqa: F401
    hourly_event_counts,
    pos_stream_ingest,
    read_events_stream,
    session_event_stats,
    sliding_event_stats,
    streaming_dedup,
)
