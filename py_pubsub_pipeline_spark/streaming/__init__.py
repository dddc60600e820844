"""Structured-Streaming helpers: watermarks, windows, stateful dedup."""

from .joins import (  # noqa: F401
    stream_stream_interval_join,
    stream_stream_interval_outer_join,
)
from .stateful import stateful_sessionize, stateful_token_bucket  # noqa: F401
from .windows import (  # noqa: F401
    sessionized_stream,
    stream_dedup_within_watermark,
    tumbling_counts_stream,
    windowed_leaderboard_stream,
)
