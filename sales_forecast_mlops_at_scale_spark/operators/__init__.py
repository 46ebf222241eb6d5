"""Relational operator library.

Each module re-expresses one operator family from SURVEY.md §2 as a pure
function ``DataFrame -> DataFrame`` built from Catalyst-optimizable
primitives (no Python UDFs in this package — the UDF surface lives in
``ml`` and ``operators.llm`` where Python execution is genuinely needed).
"""

from .dedup import latest_per_key, top_n_per_group
from .ingest import clean_sales, parse_json_events
from .matching import fuzzy_name_pairs
from .metrics import forecast_error_metrics
from .rebase import rebase_dates
from .requests import build_request_matrix
from .scaffold import date_scaffold
from .scale import salted_join, top_keys, write_bucketed
from .timeseries import (
    asof_join,
    interval_join_agg,
    moving_aggregate,
    sessionize,
)

__all__ = [
    "asof_join",
    "interval_join_agg",
    "moving_aggregate",
    "sessionize",
    "latest_per_key",
    "top_n_per_group",
    "clean_sales",
    "parse_json_events",
    "forecast_error_metrics",
    "fuzzy_name_pairs",
    "rebase_dates",
    "build_request_matrix",
    "date_scaffold",
    "salted_join",
    "top_keys",
    "write_bucketed",
]
