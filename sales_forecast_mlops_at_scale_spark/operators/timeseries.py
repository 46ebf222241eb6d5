"""Time-series operators the reference's substrate (Postgres + pandas)
could not express at scale: as-of join, sessionization, windowed moving
aggregates, and interval (range) joins.

These are beyond-reference additions (SURVEY.md §2.5 notes the reference
has no window-function usage at all); each is built purely from Catalyst
primitives — window functions + equi joins — so whole-stage codegen covers
the hot path and the only data movement is one hash shuffle per key set.

Scale notes
-----------
- :func:`asof_join` uses the **union + last(ignorenulls) window** pattern
  instead of a range join: both sides shuffle once on the join keys, each
  partition is sorted once, and there is no candidate-pair explosion —
  O(n log n) per key group vs O(n·m) for the naive range join.  This is
  the standard distributed as-of strategy (kdb/Flink temporal joins).
- :func:`sessionize` is two window passes over the same (key, ts) sort —
  Catalyst reuses one Sort+Exchange for lag, the running sum, and the
  final groupBy, so the whole operator costs a single shuffle.
- :func:`interval_join_agg` keys the join on the equi columns and applies
  the time predicate post-join: Catalyst plans a hash join on the equi
  keys (broadcast if one side is small), never a cartesian product.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str] = ("value",),
    prefix: str = "asof_",
    right_tiebreak: Sequence[str] | None = None,
) -> DataFrame:
    """For each left row, attach the newest right row with
    ``right.ts <= left.ts`` within the same ``on`` key group (left join:
    unmatched left rows keep null payload).

    Matches DuckDB/kdb ``ASOF LEFT JOIN`` semantics (inclusive on equal
    timestamps).  Output = all left columns + ``{prefix}{c}`` for each
    payload column + ``{prefix}ts`` (the matched right timestamp).

    Several right rows can share one (key, ts); engines' ASOF tie choice
    is arbitrary, so to stay deterministic across runs AND partitionings
    the right side is first collapsed to ONE row per (key, ts): the row
    maximizing ``right_tiebreak`` (default: the payload columns).  The
    extra ranking window shuffles only the (smaller) right side and is a
    no-op pass when (key, ts) is already unique.
    """
    on = list(on)
    pay = list(payload)
    tb_cols = list(right_tiebreak) if right_tiebreak is not None else pay
    w_dedup = Window.partitionBy(*on, right_ts).orderBy(
        *[F.col(c).desc_nulls_last() for c in tb_cols]
    )
    right = (
        right.withColumn("__rn", F.row_number().over(w_dedup))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    l2 = (
        left.withColumn("__ts", F.col(left_ts))
        # right rows (side 0) sort before left rows (side 1) on ties,
        # making the match inclusive of equal timestamps
        .withColumn("__side", F.lit(1))
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{prefix}{c}") for c in pay],
        F.col(right_ts).alias(f"{prefix}ts"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = [f"{prefix}{c}" for c in pay] + [f"{prefix}ts"]
    for c in matched:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).drop("__ts", "__side")


def sessionize(
    events: DataFrame,
    *,
    keys: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    gap: str = "30 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the gap
    to the previous event of the same key exceeds ``gap``.

    Output: keys + ``session_id`` (1-based per key) + ``session_start`` /
    ``session_end`` / ``n_events`` (+ ``sum_value`` when ``value_col``).
    Gap comparison is done in integral microseconds so engines agree
    exactly at the boundary.
    """
    keys = list(keys)
    num, unit = gap.split()
    unit_us = {
        "second": 1_000_000,
        "seconds": 1_000_000,
        "minute": 60_000_000,
        "minutes": 60_000_000,
        "hour": 3_600_000_000,
        "hours": 3_600_000_000,
        "day": 86_400_000_000,
        "days": 86_400_000_000,
    }[unit]
    gap_micros = int(num) * unit_us
    w = Window.partitionBy(*keys).orderBy(ts_col, tiebreak)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    is_new = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > F.lit(gap_micros)), 1
    ).otherwise(0)
    run = Window.partitionBy(*keys).orderBy(ts_col, tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessioned = events.withColumn("session_id", F.sum(is_new).over(run))
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return sessioned.groupBy(*keys, "session_id").agg(*aggs)


def moving_aggregate(
    df: DataFrame,
    *,
    keys: Sequence[str],
    order: Sequence[str],
    value_col: str = "value",
    n: int = 7,
    ndigits: int = 4,
) -> DataFrame:
    """Trailing ``n``-row moving average + running cumulative sum of
    ``value_col`` per key group (frame-spec window: ROWS n-1 PRECEDING).
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    run = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        f"ma{n}", F.round(F.avg(value_col).over(w), ndigits)
    ).withColumn("running_sum", F.round(F.sum(value_col).over(run), ndigits))


def interval_join_agg(
    anchors: DataFrame,
    events: DataFrame,
    *,
    on: Sequence[str],
    anchor_ts: str,
    event_ts: str,
    window: str = "24 hours",
    value_col: str = "value",
    id_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Range join + aggregate: for each anchor row, count/sum the events
    of the same key whose timestamp falls in
    ``(anchor_ts, anchor_ts + window]``.

    Left join keeps zero-activity anchors (count 0, sum null→0).  The
    equi key carries the hash join; the time predicate filters pairs
    inside the join, so no cross product materializes.
    """
    on = list(on)
    id_cols = list(id_cols)
    ev = events.select(
        *[F.col(c).alias(f"__r_{c}") for c in on],
        F.col(event_ts).alias("__r_ts"),
        F.col(value_col).alias("__r_value"),
    )
    cond = F.lit(True)
    for c in on:
        cond = cond & (F.col(c) == F.col(f"__r_{c}"))
    lo = F.col(anchor_ts)
    hi = F.col(anchor_ts) + F.expr(f"interval {window}")
    cond = cond & (F.col("__r_ts") > lo) & (F.col("__r_ts") <= hi)
    joined = anchors.join(ev, cond, "left")
    return joined.groupBy(*id_cols, *on, anchor_ts).agg(
        F.count("__r_ts").alias("n_follow"),
        F.round(F.coalesce(F.sum("__r_value"), F.lit(0.0)), 4).alias("sum_follow_value"),
    )
