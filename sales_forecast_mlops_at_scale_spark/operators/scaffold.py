"""Per-group daily date scaffold (SURVEY.md §2.7 F9).

The reference materializes a ``pd.date_range(start, end, freq='D')`` per
forecast request inside the service loop
(``/root/reference/services/forecast-service/app/helpers.py:29-30``).  The
relational form is ``sequence(start, end, interval 1 day)`` + ``explode`` —
a generator expression that runs inside whole-stage codegen, per row,
with no Python and no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def date_scaffold(
    df: DataFrame,
    start: Column,
    end: Column,
    *,
    out_col: str = "scaffold_date",
) -> DataFrame:
    """Append one row per day in ``[start, end]`` (inclusive) per input row."""
    return df.withColumn(
        out_col,
        F.explode(F.sequence(start.cast("date"), end.cast("date"), F.expr("interval 1 day"))),
    )
