from .pipeline import (
    session_agg,
    sliding_counts,
    stream_dedup,
    stream_events,
    tumbling_daily,
)

__all__ = [
    "session_agg",
    "sliding_counts",
    "stream_dedup",
    "stream_events",
    "tumbling_daily",
]
