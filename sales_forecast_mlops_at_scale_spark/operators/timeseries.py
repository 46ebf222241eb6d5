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


def decayed_score(
    df: DataFrame,
    *,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_days: int = 7,
    value_scale: int = 100,
    shift: int = 8,
) -> DataFrame:
    """Exponentially time-decayed engagement score per key — the
    "trending now" aggregate every feed/popularity service maintains —
    in EXACT integer arithmetic, so the result is bit-reproducible
    across engines, partitionings, and summation orders.

    Each row contributes ``value * 2^-age`` where ``age`` counts
    EPOCH-ALIGNED ``half_life_days`` buckets between the event and the
    dataset's newest timestamp: ``age = bucket(anchor) - bucket(day)``
    with ``bucket(d) = days_since_epoch(d) div half_life_days``.  The
    alignment choice is what makes the score *incrementally
    maintainable*: bucket membership never changes as the anchor
    advances (anchor-relative bucketing re-bins every historical row on
    every new day), so a streaming refresh can fold batches into
    per-(key, bucket) integer sums and derive the identical score at
    read time — see ``streaming/decay.py``, whose state is proven
    bit-equal to this batch operator in tests.  The anchor itself is the
    data's max timestamp, so the score stays a pure function of the
    data.  Because the decay base is a power of two and ``value``
    is fixed-point (``value_scale`` units per 1.0, e.g. cents), every
    contribution is representable as the integer ``value_units <<
    (shift - age)`` over the common denominator ``2^shift`` — the sum
    of those integers is EXACT, order-independent, and engine-
    independent, unlike a ``sum(value * pow(0.5, age))`` of doubles
    whose libm/row-order rounding differs between Spark and any oracle.
    Rows older than ``shift`` half-lives contribute exactly 0 (their
    true weight is below the representable resolution — documented
    truncation, identical on both sides).

    Output per key: ``n_events``, ``decayed_num`` (the exact integer
    numerator, bigint), and ``decayed_units`` = numerator / 2^shift —
    the score in ``value_col``'s fixed-point units (e.g. cents).  The
    divisor is a power of two, so the division only shifts the float
    exponent: the result is EXACT, needs no rounding, and a round-half
    boundary can never flip between engines (a ``/ (2^shift *
    value_scale)`` presentation rounded to N digits lands exactly on
    half-ulp boundaries constantly — measured, it flips HALF_UP Spark
    vs half-even DuckDB).

    Scale: one map-side-combinable hash aggregate over a column-pruned
    scan; the anchor rides a broadcast 1-row cross join (no driver
    action, no second pass over payload columns).  State is O(keys)
    regardless of history length; the incremental twin
    (``streaming/decay.py``) keeps O(keys × shift) state and folds each
    batch in O(batch) — the classic decayed-counter service, exact.
    """
    keys = list(keys)
    anchor = df.agg(F.max(F.col(ts_col).cast("date")).alias("__anchor"))
    hl = int(half_life_days)
    # floor division, NOT Spark's truncating `div`: truncation and floor
    # differ for negative day counts, so pre-1970 timestamps would bucket
    # differently from the DuckDB oracle's `//` (floor) and from the
    # streaming twin (ADVICE r8).  |unix_date| ≤ ~7.4e5 « 2^53, so the
    # float floor is exact.
    age = (
        f"(cast(floor(unix_date(__anchor) / {hl}) as bigint)"
        f" - cast(floor(unix_date(cast({ts_col} as date)) / {hl}) as bigint))"
    )
    num = F.expr(
        f"""CASE WHEN {age} <= {int(shift)}
            THEN shiftleft(cast(round({value_col} * {int(value_scale)}) as bigint),
                           {int(shift)} - cast({age} as int))
            ELSE 0L END"""
    )
    return (
        df.crossJoin(F.broadcast(anchor))
        .withColumn("__num", num)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("__num").cast("decimal(38,0)"))
            .cast("bigint")
            .alias("decayed_num"),
        )
        .withColumn(
            "decayed_units",
            F.col("decayed_num").cast("double") / float(1 << shift),
        )
    )


def robust_outliers(
    df: DataFrame,
    *,
    keys: Sequence[str],
    value_col: str,
    n_mads: float = 3.0,
) -> DataFrame:
    """Median/MAD outlier flagging per key group — the robust anomaly
    detector (mean/stddev breaks down when the anomaly itself inflates
    the threshold; median and MAD have a 50% breakdown point).

    Returns the input rows with ``med`` (group median), ``mad`` (median
    absolute deviation) and ``is_outlier`` (|x - med| > n_mads * mad;
    groups with mad = 0 flag any deviation).  Uses Spark's EXACT
    ``percentile`` — when ``value_col`` is integer-valued the median and
    MAD are exact binary fractions (k or k + 0.5), so the comparison is
    engine-exact, never a float-rounding coin flip.

    Scale: two grouped exact percentiles over the same hash partitioning
    (one Exchange; Catalyst reuses it) — intended for PRE-AGGREGATED
    series (e.g. daily totals per key: group cardinality × days rows),
    not raw events; aggregate first so the percentile's per-group sort
    is over thousands of rows, not billions.
    """
    keys = list(keys)
    med_w = Window.partitionBy(*keys)
    with_med = df.withColumn(
        "med", F.expr(f"percentile({value_col}, 0.5)").over(med_w)
    ).withColumn("__adev", F.abs(F.col(value_col) - F.col("med")))
    return (
        with_med.withColumn("mad", F.expr("percentile(__adev, 0.5)").over(med_w))
        .withColumn(
            "is_outlier",
            F.when(
                F.col("mad") > 0,
                F.col("__adev") > F.lit(n_mads) * F.col("mad"),
            ).otherwise(F.col("__adev") > 0),
        )
        .drop("__adev")
    )
