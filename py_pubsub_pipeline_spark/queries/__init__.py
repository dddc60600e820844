"""Operator inventory — importing this package populates the registry."""

from . import (  # noqa: F401
    scans,
    filters,
    aggregates,
    joins,
    windows,
    sorts_sets,
    functions_scalar,
    events_windows,
    asof,
    text,
    dedup,
    similarity,
    multimodal_q,
    advanced,
    udfs,
    composite,
    skew_q,
    graph,
    quality,
    timeseries,
)
