"""Grouped-map ML pipeline — Spark-native replacement for the reference's
Ray task fan-out + HTTP forecast service (SURVEY.md §2.9 U2-U6).

One Prophet model per (store, product) in the reference becomes one
``applyInPandas`` group here: the shuffle IS the fan-out, executors ARE the
workers, and the 1,115-model weekly run is a single Spark job with
group-level parallelism bounded only by cluster cores.
"""

from .fused import gated_forecast_groups
from .incremental import (
    delta_fingerprints,
    incremental_train,
    merge_fingerprints,
    series_fingerprints,
)
from .gate import DEFAULT_MAX_RMSE, gate_report, gate_series, passing_model_keys
from .models import SeasonalNaiveModel, get_model
from .predict import forecast_groups
from .train import train_groups

__all__ = [
    "DEFAULT_MAX_RMSE",
    "delta_fingerprints",
    "SeasonalNaiveModel",
    "forecast_groups",
    "gate_report",
    "gate_series",
    "gated_forecast_groups",
    "get_model",
    "incremental_train",
    "merge_fingerprints",
    "passing_model_keys",
    "series_fingerprints",
    "train_groups",
]
