"""Semantic unit tests for the time-series operator family (as-of join,
sessionization, interval join, moving aggregates, approx distinct) —
boundary behavior the oracle-differential tests don't isolate."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sales_forecast_mlops_at_scale_spark.catalog import load_table
from sales_forecast_mlops_at_scale_spark.operators.timeseries import (
    asof_join,
    interval_join_agg,
    sessionize,
)

from .conftest import SF_DIR

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def test_approx_percentile_within_tolerance(spark):
    """percentile_approx (the sketch twin of the exact q_percentiles
    oracle path) must land within 2% of the exact median — sketches are
    rows-only in the driver gate, tolerance-tested here."""
    orders = load_table(spark, SF_DIR, "orders")
    row = orders.agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("a"),
        F.expr("percentile(o_totalprice, 0.5)").alias("e"),
    ).collect()[0]
    assert abs(row.a - row.e) / row.e < 0.02


def test_asof_join_right_tie_deterministic(spark):
    """Two right rows at the SAME (key, ts): the max-payload row must win,
    regardless of partitioning/run (engines' native ASOF tie is arbitrary)."""
    left = spark.createDataFrame(
        [(1, 10, _ts(5))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _ts(0), 5.0), (10, _ts(0), 9.0), (10, _ts(0), 1.0)],
        "user_id long, ts timestamp, value double",
    )
    out = asof_join(left, right, on=["user_id"], payload=["value"]).collect()
    assert len(out) == 1 and out[0].asof_value == 9.0


def test_asof_join_inclusive_and_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(0)), (2, 10, _ts(5)), (3, 20, _ts(1))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        # user 10: one match exactly at left ts (inclusive), one later row
        # that must NOT match the earlier left row; user 20: no rows.
        [(10, _ts(0), 1.0), (10, _ts(4), 2.0), (10, _ts(9), 9.9)],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r.event_id: (r.asof_ts, r.asof_value)
        for r in asof_join(left, right, on=["user_id"]).collect()
    }
    assert out[1] == (_ts(0), 1.0)  # equal timestamps match (inclusive)
    assert out[2] == (_ts(4), 2.0)  # newest ≤ ts, not the later 9.9 row
    assert out[3] == (None, None)  # left join keeps unmatched rows


def test_sessionize_gap_boundary(spark):
    # gaps: exactly 30m (same session), 30m+1µs (new session)
    rows = [
        (1, 7, _ts(0), 1.0),
        (2, 7, _ts(30), 1.0),  # == gap → same session
        (3, 7, _ts(60) + dt.timedelta(microseconds=1), 1.0),  # > gap → new
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    sessions = sessionize(df, gap="30 minutes").collect()
    by_id = {r.session_id: r.n_events for r in sessions}
    assert by_id == {1: 2, 2: 1}


def test_interval_join_keeps_zero_activity_anchors(spark):
    anchors = spark.createDataFrame(
        [(1, 5, _ts(0)), (2, 6, _ts(0))], "event_id long, user_id long, ts timestamp"
    )
    events = spark.createDataFrame(
        # in-window for user 5; boundary: > anchor ts excludes equality
        [(5, _ts(0), 4.0), (5, _ts(10), 2.0), (5, _ts(60 * 25), 8.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r.event_id: (r.n_follow, r.sum_follow_value)
        for r in interval_join_agg(
            anchors, events, on=["user_id"], anchor_ts="ts", event_ts="ts"
        ).collect()
    }
    assert out[1] == (1, 2.0)  # equality and beyond-24h rows excluded
    assert out[2] == (0, 0.0)  # zero-activity anchor kept with 0


def test_approx_users_within_tolerance(spark):
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.approx_users
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, approx[k], n)


def test_expectation_report_one_pass_and_verdicts(spark):
    """Synthetic frame with a known violation: the metric/threshold/passed
    triple must reflect it, and the whole suite must compile to ONE
    aggregate over the input (no per-check jobs)."""
    from sales_forecast_mlops_at_scale_spark.operators.warehouse import (
        Expectation,
        expectation_report,
        fk_coverage_report,
        fraction_where,
        uniqueness,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", -1.0), (3, "a", 5.0), (3, "c", 2.0)],
        ["id", "cat", "amount"],
    )
    rep = {
        r.check: r
        for r in expectation_report(
            df,
            [
                Expectation("completeness.id", fraction_where(F.col("id").isNotNull()), 1.0),
                Expectation("uniqueness.id", uniqueness("id"), 1.0),
                Expectation("positive.amount", fraction_where(F.col("amount") > 0), 1.0),
            ],
        ).collect()
    }
    assert rep["completeness.id"].passed
    assert not rep["uniqueness.id"].passed and rep["uniqueness.id"].metric == 0.75
    assert not rep["positive.amount"].passed and rep["positive.amount"].metric == 0.75

    parent = spark.createDataFrame([(1,), (2,)], ["pk"])
    fk = fk_coverage_report(df, parent, "id", "pk", name="fk.parent").collect()[0]
    assert fk.metric == 0.5 and not fk.passed


def test_exactness_constraint_not_fooled_by_display_rounding(spark):
    """ADVICE r4 regression: ONE violation in a table large enough that
    the violation fraction rounds (at 6 dp) to 1.000000 must still FAIL
    an exactness (minimum=1.0) constraint — the verdict compares the
    unrounded metric, only the displayed metric is rounded."""
    from pyspark.sql import functions as F

    from sales_forecast_mlops_at_scale_spark.operators.warehouse import (
        Expectation,
        expectation_report,
        fraction_where,
    )

    n = 4_000_000  # 1/n = 2.5e-7 < 5e-7, rounds away at 6 dp
    df = spark.range(n).select(
        F.when(F.col("id") == 0, None).otherwise(F.col("id")).alias("v")
    )
    row = expectation_report(
        df,
        [Expectation("completeness.v", fraction_where(F.col("v").isNotNull()), 1.0)],
    ).collect()[0]
    assert row.metric == 1.0  # display rounds up...
    assert not row.passed  # ...but the verdict sees the violation
