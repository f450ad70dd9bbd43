from .events import (
    session_agg,
    sliding_window_agg,
    streaming_tumbling_counts,
    tumbling_window_agg,
)

__all__ = [
    "session_agg",
    "sliding_window_agg",
    "streaming_tumbling_counts",
    "tumbling_window_agg",
]
