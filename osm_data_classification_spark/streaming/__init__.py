from .pipeline import (
    running_user_totals,
    session_agg,
    sliding_counts,
    stream_dedup,
    stream_events,
    tumbling_daily,
)

__all__ = [
    "running_user_totals",
    "session_agg",
    "sliding_counts",
    "stream_dedup",
    "stream_events",
    "tumbling_daily",
]
