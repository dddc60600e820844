"""Structured-Streaming helpers: watermarks, windows, stateful dedup."""

from .joins import stream_stream_interval_join  # noqa: F401
from .stateful import stateful_sessionize  # noqa: F401
from .windows import (  # noqa: F401
    sessionized_stream,
    stream_dedup_within_watermark,
    tumbling_counts_stream,
    windowed_leaderboard_stream,
)
