"""Forecast-error metric aggregates (SURVEY.md §2.4 A6).

The reference computes RMSE / MAPE / MAE / MedAE with sklearn over
driver-local pandas arrays per CV split
(``/root/reference/services/training-service/app/train_utils.py:38-53``).
Here they are distributed SQL aggregates — partial (map-side) aggregation,
whole-stage codegen, no Python:

- rmse  = sqrt(avg((y - yhat)^2))
- mape  = avg(abs((y - yhat) / y)) over rows with y != 0
- mae   = avg(abs(y - yhat))
- medae = median(abs(y - yhat))  (exact ``percentile``; swap in
  ``percentile_approx`` at extreme scale where an exact median's
  per-group sort is not worth it)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def error_metric_columns(y: Column, yhat: Column, *, ndigits: int = 4) -> list[Column]:
    err = y - yhat
    abs_err = F.abs(err)
    return [
        F.round(F.sqrt(F.avg(err * err)), ndigits).alias("rmse"),
        # zero actuals contribute NULL (try_divide) and drop out of the
        # mean — the standard MAPE zero-handling, matching the numpy
        # fold path (train.py) and avoiding ANSI DIVIDE_BY_ZERO
        F.round(F.avg(F.abs(F.try_divide(err, y))), ndigits).alias("mape"),
        F.round(F.avg(abs_err), ndigits).alias("mae"),
        F.round(F.expr("percentile(abs(__y - __yhat), 0.5)"), ndigits).alias("medae"),
    ]


def forecast_error_metrics(
    df: DataFrame,
    keys: Sequence[str],
    y_col: str = "y",
    yhat_col: str = "yhat",
    *,
    ndigits: int = 4,
) -> DataFrame:
    """Grouped error metrics over (y, yhat) pairs.

    Results are rounded to ``ndigits`` so differential-testing hashes are
    stable across summation orders (floating-point sums are
    order-sensitive; Spark's partial aggregation order is not deterministic).
    """
    prepared = df.withColumn("__y", F.col(y_col).cast("double")).withColumn(
        "__yhat", F.col(yhat_col).cast("double")
    )
    cols = error_metric_columns(F.col("__y"), F.col("__yhat"), ndigits=ndigits)
    out = prepared.groupBy(*keys).agg(*cols, F.count(F.lit(1)).alias("n_pairs"))
    return out
