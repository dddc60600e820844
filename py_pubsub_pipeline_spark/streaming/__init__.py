"""Structured-Streaming helpers: watermarks, windows, stateful dedup."""

from .windows import (  # noqa: F401
    sessionized_stream,
    stream_dedup_within_watermark,
    tumbling_counts_stream,
)
