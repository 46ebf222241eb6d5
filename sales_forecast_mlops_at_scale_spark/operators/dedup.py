"""Latest-per-key dedup and top-N-per-group — window rewrites of the
reference's self-join queries (SURVEY.md §2.3 J1 / §2.5 W1-W2).

The reference answers "latest forecast per (store, product, forecast_date)"
with a GROUP-BY-MAX subquery self-joined back on four equality predicates
(``/root/reference/services/web-ui/app/db_utils.py:40-62``) — two scans plus
a join.  The canonical Spark form is a single ranking window: one shuffle on
the partition keys, one pass, no join.  At 100 TB this halves the I/O and
removes a join whose build side is nearly as large as the fact table.

Skew note: ranking windows shuffle on ``keys``; a pathologically hot key
serializes into one task.  AQE cannot split a window partition, so callers
with known hot keys should pre-aggregate or salt upstream.  For the dedup
use-case keys are (entity, day) — bounded per-key cardinality — so the plan
holds at 1000 executors.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Column | str,
) -> DataFrame:
    """Keep the single newest row per key group.

    ``order_by``: column (or name) ranked **descending**; ties broken by the
    column itself being unique (the reference uses a surrogate ``id``).

    Reference: web-ui/app/db_utils.py:40-62 (J1) — groupwise MAX(id) + self
    join.  Here: ``row_number() OVER (PARTITION BY keys ORDER BY ord DESC)``.
    """
    ord_col = F.col(order_by) if isinstance(order_by, str) else order_by
    w = Window.partitionBy(*keys).orderBy(ord_col.desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_n_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    n: int,
) -> DataFrame:
    """Top-``n`` rows per key group under ``order_by`` (list of Columns,
    e.g. ``[F.col('ts').desc(), F.col('id').desc()]`` — pass deterministic
    tie-breakers explicitly).

    Reference: web-ui/app/db_utils.py:70-71 + main.py:78-85 (W2) runs
    ``ORDER BY .. DESC LIMIT n`` once per group per UI request; this computes
    every group in one shuffle.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
