"""Composed operators that Spark lacks as primitives (skew tools,
as-of joins live in queries/asof.py)."""

from .skew import salted_agg, salted_join  # noqa: F401
