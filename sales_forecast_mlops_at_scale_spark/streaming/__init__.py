"""Structured Streaming ingest — the reference's daily Kafka→Postgres
drain (SURVEY.md §2.8), upgraded from at-least-once to exactly-once."""

from .ingest import (
    run_stream_ingest,
    streaming_dedup,
    windowed_daily_rollup,
    windowed_sliding_rollup,
)

__all__ = [
    "run_stream_ingest",
    "streaming_dedup",
    "windowed_daily_rollup",
    "windowed_sliding_rollup",
]
