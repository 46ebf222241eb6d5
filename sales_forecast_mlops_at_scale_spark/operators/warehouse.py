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
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
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
    current attributes are no-ops.

    Plan shape: ONE broadcast-or-shuffle join on the key (closed rows
    ride it unmatched — ``valid_to IS NULL`` is part of the join
    condition, so history never joins), then each joined row EXPLODES
    into its one-or-two output rows (kept as-is, or closed + new
    version).  The earlier filter-three-ways-and-union formulation
    re-evaluated the un-persisted join per branch — at dimension scale
    that scanned ``current`` ~6× instead of once (caught by
    tools/scan_audit.py, the psi_report r8 defect class).
    """
    key = list(key)
    attrs = list(attrs)

    u = updates.select(
        *[F.col(c).alias(f"__u_{c}") for c in key],
        *[F.col(c).alias(f"__u_{c}") for c in attrs],
        F.col(effective_col).alias("__u_eff"),
    )
    import functools
    import operator

    # only OPEN rows can match an update; closed history falls through
    # the left join unmatched instead of being split off by a 2nd scan
    cond = [F.col(c) == F.col(f"__u_{c}") for c in key] + [
        F.col(valid_to).isNull()
    ]
    # null-safe change detection: a NULL attr differing from a value IS a
    # change (plain != would yield NULL and silently drop the update)
    any_change = functools.reduce(
        operator.or_,
        [~F.col(f"__u_{a}").eqNullSafe(F.col(a)) for a in attrs],
    )
    joined = current.join(u, cond, "left")

    cols = list(current.columns)
    to_type = joined.schema[valid_to].dataType

    def _struct(overrides: dict) -> F.Column:
        return F.struct(
            *[overrides.get(c, F.col(c)).alias(c) for c in cols]
        )

    kept = _struct({})  # closed history + unchanged/no-update open rows
    closed = _struct({valid_to: F.col("__u_eff")})
    new_version = _struct(
        {
            **{a: F.col(f"__u_{a}") for a in attrs},
            valid_from: F.col("__u_eff"),
            valid_to: F.lit(None).cast(to_type),
        }
    )
    change = F.col("__u_eff").isNotNull() & any_change
    return (
        joined.select(
            F.explode(
                F.when(change, F.array(closed, new_version)).otherwise(
                    F.array(kept)
                )
            ).alias("__r")
        )
        .select("__r.*")
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


# -- declarative data-quality expectations (Deequ-style) ----------------------


@dataclass(frozen=True)
class Expectation:
    """One data-quality constraint: an aggregate ``metric`` expression
    (a ``Column`` evaluating to a double, conventionally a [0,1] ratio)
    and the ``minimum`` value it must reach to pass."""

    name: str
    metric: Column
    minimum: float


def fraction_where(cond: Column) -> Column:
    """Exact fraction of rows satisfying ``cond``: integer 0/1 sum over
    long, ONE double division at the end — engine-exact (float summation
    order never enters), unlike ``avg(bool)`` whose accumulation is
    engine-defined."""
    return F.sum(F.when(cond, 1).otherwise(0)).cast("double") / F.count(F.lit(1))


def uniqueness(col: str) -> Column:
    """distinct/total ratio — 1.0 means the column is a candidate key."""
    return F.count_distinct(F.col(col)).cast("double") / F.count(F.lit(1))


def expectation_report(df: DataFrame, expectations: Sequence[Expectation]) -> DataFrame:
    """Evaluate all expectations against ``df`` in ONE aggregation pass
    (Deequ's VerificationSuite shape: however many constraints, one scan).

    Returns ``check, metric, threshold, passed`` — one row per
    expectation.  Every metric is a conditional aggregate, so the single
    job partial-aggregates map-side and shuffles one row per partition;
    ``count_distinct`` metrics add their keyed partial-agg but still ride
    the same pass.  At 100 TB this runs at scan speed; the alternative —
    one job per constraint — rescans the table N times.

    The REPORTED metric is rounded to 6 dp (display stability), but the
    pass/fail verdict for an EXACTNESS constraint (``minimum >= 1.0``)
    compares the UNROUNDED metric: rounding first would report
    ``passed=true`` with a violation fraction up to ~5e-7, i.e. real
    violations silently pass on any table beyond ~2M rows.  The
    unrounded fraction is an integer-sum / integer-count double
    division, so ``metric == 1.0`` exactly iff violations == 0 for any
    table under 2^53 rows — engine-exact in both Spark and the DuckDB
    oracle twin.  Fractional thresholds (< 1.0) keep the 6 dp rounding
    so near-threshold float noise can't flap the verdict between
    engines.
    """
    exps = list(expectations)
    wide = df.agg(
        *[e.metric.cast("double").alias(f"__m{i}") for i, e in enumerate(exps)]
    )

    def _passed(i: int, e: Expectation) -> Column:
        if float(e.minimum) >= 1.0:
            return F.col(f"__m{i}") >= F.lit(float(e.minimum))
        return F.round(F.col(f"__m{i}"), 6) >= F.lit(float(e.minimum))

    rows = [
        F.struct(
            F.lit(e.name).alias("check"),
            F.round(F.col(f"__m{i}"), 6).alias("metric"),
            F.lit(float(e.minimum)).cast("double").alias("threshold"),
            _passed(i, e).alias("passed"),
        )
        for i, e in enumerate(exps)
    ]
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def fk_coverage_report(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    *,
    name: str,
    minimum: float = 1.0,
) -> DataFrame:
    """Referential-integrity expectation: fraction of child rows whose
    ``fk`` exists in parent's ``pk``, in the same report row shape as
    :func:`expectation_report`.

    Shape: distinct parent keys (partial-aggregated) left-join the child
    fk column — one shuffle keyed on the fk, the unavoidable semi-join
    shape for RI at scale (neither side is broadcastable at 100 TB; AQE
    still converts it when the parent IS small).  NULL fks count as
    violations — use a separate completeness expectation to tell the two
    failure modes apart.
    """
    hits = (
        parent.select(F.col(pk).alias(fk))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    joined = child.select(fk).join(hits, fk, "left")
    metric = F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("double") / F.count(
        F.lit(1)
    )
    wide = joined.agg(metric.alias("__m"))
    passed = (
        (F.col("__m") >= F.lit(float(minimum)))
        if float(minimum) >= 1.0
        else (F.round(F.col("__m"), 6) >= F.lit(float(minimum)))
    )
    return wide.select(
        F.lit(name).alias("check"),
        F.round(F.col("__m"), 6).alias("metric"),
        F.lit(float(minimum)).cast("double").alias("threshold"),
        passed.alias("passed"),
    )
