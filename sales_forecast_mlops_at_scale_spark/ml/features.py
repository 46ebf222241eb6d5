"""Point-in-time-correct feature engineering for the forecast pipeline.

The reference prepares its training frame in pandas on a single node
(services/training_service — lag/rolling features per (store, product)
before handing rows to Prophet/Ray).  At 100 TB that stage, not the model
fit, is the bottleneck — and done naively (a self-join per lag, or a
pandas groupby-apply) it is also where *label leakage* creeps in.  This
module builds the whole feature matrix with calendar-aware window frames
over ONE sort of ONE hash partitioning:

- every trailing feature uses a ``RANGE`` frame over the day index that
  ends at ``-1`` (yesterday), so the current row's label can never leak
  into its own features — point-in-time correctness *by construction*;
- ``RANGE`` (calendar) frames, not ``ROWS``, so gap days (no sales) don't
  silently stretch a "7-day" lag into a 7-*observation* lag — the classic
  sparse-series bug in row-offset ``lag()`` features;
- Catalyst plans all frames over a single Exchange + Sort on the group
  keys: adding a feature column is free of additional shuffles, and the
  same partitioning feeds the downstream grouped-map trainer
  (``ml/train.py``) with zero re-shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def feature_matrix(
    series: DataFrame,
    keys: Sequence[str],
    *,
    date_col: str = "ds",
    y_col: str = "y",
    lags: Sequence[int] = (7, 14),
    ma_window: int = 28,
    ndigits: int = 4,
    keep_day_index: bool = False,
) -> DataFrame:
    """Per-(key, day) training matrix: label + leak-free features.

    Columns: the keys, ``ds``, label ``y``, ``lag_{d}`` (the value
    exactly ``d`` calendar days earlier, null when that day has no row),
    ``ma_{w}`` (mean over the ``w`` calendar days ENDING YESTERDAY,
    null when that span is empty), ``n_hist`` (prior observation count —
    a training-readiness signal), and calendar features ``isodow`` (1 =
    Monday … 7 = Sunday, the seasonal-naive model's own key) and
    ``month``.

    Determinism: the moving mean is ``round(sum/count)`` where the sum
    is exact when ``y`` is integral (daily unit counts); every other
    column is exact integer/date arithmetic.

    ``keep_day_index=True`` retains the ``__di`` epoch-day column the
    frames sort on, so a downstream consumer can declare ITS sort key
    as an alias of the same attribute — Catalyst then recognizes the
    Window's partition-local order as already satisfying the consumer's
    (e.g. ``sorted_group_map``'s) required ordering and elides the
    second Sort (a recomputed-expression sort key, even a semantically
    identical one, breaks the alias chain and re-sorts).
    """
    keys = list(keys)
    di = F.unix_date(F.col(date_col).cast("date"))
    out = series.withColumn("__di", di)
    base = Window.partitionBy(*keys).orderBy("__di")
    for d in lags:
        # unique (key, day) ⇒ max() over the 1-day frame IS the value
        out = out.withColumn(
            f"lag_{d}",
            F.max(y_col).over(base.rangeBetween(-d, -d)),
        )
    trail = base.rangeBetween(-ma_window, -1)
    out = (
        out.withColumn(
            f"ma_{ma_window}",
            F.round(F.sum(y_col).over(trail) / F.count(y_col).over(trail), ndigits),
        )
        .withColumn(
            "n_hist",
            F.count(y_col).over(base.rangeBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn("isodow", (F.weekday(F.col(date_col)) + F.lit(1)).cast("int"))
        .withColumn("month", F.month(F.col(date_col)).cast("int"))
    )
    return out if keep_day_index else out.drop("__di")
