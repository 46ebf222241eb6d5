"""Warehouse-maintenance operators: SCD2 dimension merges and
incremental aggregate maintenance.

Both address the "don't recompute the world" discipline a 100 TB
deployment lives by:

- :func:`scd2_merge` — apply a batch of attribute updates to a
  slowly-changing-dimension table, closing superseded versions and
  appending new ones (the Kimball type-2 contract: full history, one
  current row per key).
- :func:`merge_rollup` — fold a new partition's partial aggregate into an
  existing rollup WITHOUT rescanning history.  Sum/count (and any other
  commutative monoid) aggregates merge exactly; the correctness claim is
  oracle-checked by comparing the merged result against a from-scratch
  aggregation of the full input (``plans/analytics_queries.q_incremental_rollup``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    *,
    key: Sequence[str],
    attrs: Sequence[str],
    effective_col: str = "effective_date",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Type-2 SCD merge: for every update whose attributes differ from the
    key's current row, close that row (``valid_to`` = effective date) and
    append the new version (open-ended ``valid_to`` = NULL).

    ``current`` must carry exactly one OPEN row per key (valid_to NULL) —
    closed history rows pass through untouched.  Updates equal to the
    current attributes are no-ops.  One broadcast-or-shuffle join on the
    key; no windows, no history rescan.
    """
    key = list(key)
    attrs = list(attrs)
    open_rows = current.filter(F.col(valid_to).isNull())
    closed_rows = current.filter(F.col(valid_to).isNotNull())

    u = updates.select(
        *[F.col(c).alias(f"__u_{c}") for c in key],
        *[F.col(c).alias(f"__u_{c}") for c in attrs],
        F.col(effective_col).alias("__u_eff"),
    )
    import functools
    import operator

    cond = [F.col(c) == F.col(f"__u_{c}") for c in key]
    # null-safe change detection: a NULL attr differing from a value IS a
    # change (plain != would yield NULL and silently drop the update)
    any_change = functools.reduce(
        operator.or_,
        [~F.col(f"__u_{a}").eqNullSafe(F.col(a)) for a in attrs],
    )
    joined = open_rows.join(u, cond, "left")

    kept_open = joined.filter(F.col("__u_eff").isNull() | ~any_change).select(
        *current.columns
    )
    newly_closed = (
        joined.filter(F.col("__u_eff").isNotNull() & any_change)
        .withColumn(valid_to, F.col("__u_eff"))
        .select(*current.columns)
    )
    new_versions = (
        joined.filter(F.col("__u_eff").isNotNull() & any_change)
        .select(
            *[F.col(c) for c in key],
            *[F.col(f"__u_{a}").alias(a) for a in attrs],
            F.col("__u_eff").alias(valid_from),
            F.lit(None).cast(joined.schema[valid_to].dataType).alias(valid_to),
        )
        .select(*current.columns)
    )
    return closed_rows.unionByName(kept_open).unionByName(newly_closed).unionByName(
        new_versions
    )


def merge_rollup(
    existing: DataFrame,
    new_rows: DataFrame,
    *,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_col: str = "n_rows",
) -> DataFrame:
    """Fold new fact rows into an existing (keys → counts/sums) rollup.

    The new rows are partially aggregated, unioned with the existing
    rollup, and re-reduced — the classic monoid merge.  Only the NEW
    partition is scanned; the merged output is bit-identical to
    recomputing the rollup over (old facts ∪ new facts).
    """
    keys = list(keys)
    sums = list(sum_cols)
    new_agg = new_rows.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.sum(c).alias(c) for c in sums],
    )
    return (
        existing.unionByName(new_agg)
        .groupBy(*keys)
        .agg(
            F.sum(count_col).cast("long").alias(count_col),
            *[F.sum(c).alias(c) for c in sums],
        )
    )
