"""feature_matrix: point-in-time correctness and calendar-gap semantics."""

import datetime as dt

import pytest

from sales_forecast_mlops_at_scale_spark.ml.features import feature_matrix


def _series(spark, rows):
    return spark.createDataFrame(
        [(k, dt.date(2024, 1, 1) + dt.timedelta(days=d), float(y)) for k, d, y in rows],
        "k string, ds date, y double",
    )


def _by_day(df):
    return {(r.k, r.ds.day): r for r in df.collect()}


def test_lag_is_calendar_not_row_offset(spark):
    # days 1..3 then a gap, then day 8: lag_7 of day 8 is day 1 (exactly
    # 7 calendar days back), NOT the 7th prior observation (which
    # doesn't exist) and NOT day 3 (the prior row).
    m = _by_day(
        feature_matrix(
            _series(spark, [("a", 0, 10), ("a", 1, 20), ("a", 2, 30), ("a", 7, 99)]),
            ["k"],
            lags=(7,),
            ma_window=28,
        )
    )
    assert m[("a", 8)].lag_7 == 10.0
    assert m[("a", 2)].lag_7 is None  # no row 7 days before day 2


def test_no_leakage_current_day_excluded_everywhere(spark):
    # two days: day 2's ma/n_hist see ONLY day 1; day 1 sees nothing
    m = _by_day(
        feature_matrix(
            _series(spark, [("a", 0, 10), ("a", 1, 30)]), ["k"], lags=(7,), ma_window=28
        )
    )
    assert m[("a", 1)].ma_28 is None and m[("a", 1)].n_hist == 0
    assert m[("a", 2)].ma_28 == 10.0 and m[("a", 2)].n_hist == 1


def test_ma_window_is_trailing_calendar_span(spark):
    # ma_3 at day 5 covers calendar days 2..4 → rows at day 2 (y=20) and
    # day 4 (y=40) → mean 30; the day-1 row is outside the 3-day span.
    m = _by_day(
        feature_matrix(
            _series(spark, [("a", 0, 10), ("a", 1, 20), ("a", 3, 40), ("a", 4, 99)]),
            ["k"],
            lags=(7,),
            ma_window=3,
        )
    )
    assert m[("a", 5)].ma_3 == 30.0


def test_groups_are_independent(spark):
    m = _by_day(
        feature_matrix(
            _series(spark, [("a", 0, 10), ("b", 7, 77)]), ["k"], lags=(7,), ma_window=28
        )
    )
    # b's day 8 must not see a's day 1 despite the exact 7-day offset
    assert m[("b", 8)].lag_7 is None and m[("b", 8)].n_hist == 0


def test_calendar_features(spark):
    m = _by_day(feature_matrix(_series(spark, [("a", 0, 1)]), ["k"]))
    r = m[("a", 1)]  # 2024-01-01 is a Monday
    assert r.isodow == 1 and r.month == 1


def test_single_exchange_plan(spark):
    """All window frames + the upstream daily agg ride ONE exchange when
    the series is pre-partitioned on the keys (the trainer's contract)."""
    df = feature_matrix(
        _series(spark, [("a", i, i) for i in range(40)]).repartition("k"), ["k"]
    )
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1
