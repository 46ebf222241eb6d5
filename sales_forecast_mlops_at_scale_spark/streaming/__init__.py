"""Structured Streaming ingest — the reference's daily Kafka→Postgres
drain (SURVEY.md §2.8), upgraded from at-least-once to exactly-once."""

from .ingest import run_stream_ingest, windowed_daily_rollup

__all__ = ["run_stream_ingest", "windowed_daily_rollup"]
