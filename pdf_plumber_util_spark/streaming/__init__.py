from .events import (  # noqa: F401
    stream_events,
    hourly_counts_stream,
    session_stream,
    stream_extraction_metrics,
)
