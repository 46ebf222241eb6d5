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


# -- k-anonymity ---------------------------------------------------------------


def test_k_anonymity_report_basic(spark):
    from sales_forecast_mlops_at_scale_spark.operators.privacy import (
        k_anonymity_report,
    )

    # classes by (a,b): (x,1)x3, (x,2)x1, (y,1)x4  → min class 1
    rows = [("x", 1)] * 3 + [("x", 2)] + [("y", 1)] * 4
    df = spark.createDataFrame(rows, ["a", "b"])
    rep = {
        r.level: r
        for r in k_anonymity_report(df, [["a", "b"], ["a"]], ks=(2, 4)).collect()
    }
    full = rep["a+b"]
    assert full.n_classes == 3 and full.min_class_size == 1 and full.n_rows == 8
    assert full.rows_lt_2 == 1  # the singleton (x,2)
    assert full.rows_lt_4 == 4  # (x,1)x3 + (x,2)x1
    assert full.risk_ppm_2 == 125_000
    gen = rep["a"]  # generalizing away b: classes x:4, y:4 → safe at k=4
    assert gen.n_classes == 2 and gen.min_class_size == 4
    assert gen.rows_lt_2 == 0 and gen.rows_lt_4 == 0 and gen.risk_ppm_4 == 0


def test_k_anonymity_null_qi_is_its_own_class(spark):
    """NULL QI values are data (their own equivalence class), not
    grouping-set subtotal markers — the grouping() flags keep them
    apart."""
    from sales_forecast_mlops_at_scale_spark.operators.privacy import (
        k_anonymity_report,
    )

    df = spark.createDataFrame(
        [("x", 1), ("x", None), ("x", None)], ["a", "b"]
    )
    rep = {
        r.level: r
        for r in k_anonymity_report(df, [["a", "b"], ["a"]], ks=(2,)).collect()
    }
    assert rep["a+b"].n_classes == 2  # (x,1) and (x,NULL)
    assert rep["a+b"].rows_lt_2 == 1
    assert rep["a"].n_classes == 1 and rep["a"].rows_lt_2 == 0


def test_k_anonymity_duplicate_level_rejected(spark):
    import pytest as _pytest

    from sales_forecast_mlops_at_scale_spark.operators.privacy import (
        k_anonymity_report,
    )

    df = spark.createDataFrame([("x", 1)], ["a", "b"])
    with _pytest.raises(ValueError, match="duplicate"):
        k_anonymity_report(df, [["a", "b"], ["b", "a"]])


# -- decayed score -------------------------------------------------------------


def test_decayed_score_exact_halving(spark):
    """One event per half-life bucket, value 1.00: weights are exactly
    1, 1/2, 1/4 — numerator 256+128+64 over 2^8."""
    import datetime as dt

    from sales_forecast_mlops_at_scale_spark.operators.timeseries import (
        decayed_score,
    )

    base = dt.datetime(2024, 3, 31, 12, 0, 0)
    rows = [
        (1, base, 1.0),                            # age bucket 0
        (1, base - dt.timedelta(days=7), 1.0),     # bucket 1
        (1, base - dt.timedelta(days=14), 1.0),    # bucket 2
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = decayed_score(
        df, keys=["user_id"], half_life_days=7, value_scale=100, shift=8
    ).collect()[0]
    assert out.n_events == 3
    assert out.decayed_num == 100 * (256 + 128 + 64)
    assert out.decayed_units == 100 * (1 + 0.5 + 0.25)


def test_decayed_score_old_rows_contribute_zero(spark):
    import datetime as dt

    from sales_forecast_mlops_at_scale_spark.operators.timeseries import (
        decayed_score,
    )

    base = dt.datetime(2024, 3, 31)
    df = spark.createDataFrame(
        [(1, base, 5.0), (1, base - dt.timedelta(days=7 * 9), 1000.0)],
        "user_id long, ts timestamp, value double",
    )
    out = decayed_score(
        df, keys=["user_id"], half_life_days=7, value_scale=100, shift=8
    ).collect()[0]
    assert out.n_events == 2  # counted...
    assert out.decayed_num == 500 * 256  # ...but weight exactly 0 past shift


def test_decayed_score_partition_invariant(spark):
    """Exact integer arithmetic ⇒ bit-identical under any partitioning."""
    import datetime as dt

    from sales_forecast_mlops_at_scale_spark.operators.timeseries import (
        decayed_score,
    )

    base = dt.datetime(2024, 3, 31)
    rows = [
        (i % 7, base - dt.timedelta(days=i % 29, hours=i % 23), 0.01 * (i % 997))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    a = {
        r.user_id: (r.decayed_num, r.decayed_units)
        for r in decayed_score(df.repartition(1), keys=["user_id"]).collect()
    }
    b = {
        r.user_id: (r.decayed_num, r.decayed_units)
        for r in decayed_score(df.repartition(16), keys=["user_id"]).collect()
    }
    assert a == b


# -- robust outliers -----------------------------------------------------------


def test_robust_outliers_flags_spike_not_mean_pull(spark):
    """A single huge spike must be flagged, and must NOT drag the
    threshold (the mean/stddev failure mode) so normal days stay
    unflagged."""
    from sales_forecast_mlops_at_scale_spark.operators.timeseries import (
        robust_outliers,
    )

    vals = [100, 101, 99, 102, 98, 100, 5000]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)], ["k", "i", "x"]
    )
    out = {r.i: r for r in robust_outliers(df, keys=["k"], value_col="x").collect()}
    assert out[6].is_outlier
    assert not any(out[i].is_outlier for i in range(6))
    assert out[0].med == 100.0  # spike didn't move the centre


def test_robust_outliers_zero_mad_group(spark):
    """Constant group: mad = 0 → any deviation is an outlier, the
    constant rows are not."""
    from sales_forecast_mlops_at_scale_spark.operators.timeseries import (
        robust_outliers,
    )

    df = spark.createDataFrame(
        [("a", 0, 5), ("a", 1, 5), ("a", 2, 5), ("a", 3, 6)], ["k", "i", "x"]
    )
    out = {r.i: r for r in robust_outliers(df, keys=["k"], value_col="x").collect()}
    assert out[3].is_outlier and not out[0].is_outlier
    assert out[0].mad == 0.0


# -- distribution drift (PSI + binned KS) ---------------------------------------


def test_psi_zero_for_identical_distributions(spark):
    """Same window on both sides: every bin share matches, PSI = 0 and
    KS = 0 exactly (smoothing cancels)."""
    from sales_forecast_mlops_at_scale_spark.operators.drift import psi_report

    df = spark.createDataFrame([(float(i % 17),) for i in range(500)], ["x"])
    row = psi_report(df, df, ["x"]).collect()[0]
    assert row.psi == 0.0 and row.ks_ppm == 0
    assert row.n_ref == 500 and row.n_cur == 500


def test_psi_nonnegative_and_orders_drift(spark):
    """Gibbs: PSI ≥ 0 always; a shifted window scores strictly higher
    than a mildly perturbed one."""
    from sales_forecast_mlops_at_scale_spark.operators.drift import psi_report

    ref = spark.createDataFrame([(float(i % 100),) for i in range(1000)], ["x"])
    mild = spark.createDataFrame(
        [(float((i + 3) % 100),) for i in range(1000)], ["x"]
    )
    shifted = spark.createDataFrame(
        [(float(50 + i % 100),) for i in range(1000)], ["x"]
    )
    p_mild = psi_report(ref, mild, ["x"]).collect()[0].psi
    p_shift = psi_report(ref, shifted, ["x"]).collect()[0].psi
    assert p_mild >= 0.0 and p_shift >= 0.0
    assert p_shift > p_mild
    assert p_shift > 0.25  # the "retrain" convention band


def test_ks_detects_median_shift_psi_grid_shared(spark):
    """KS is the max CDF gap: moving half the mass one bin over gives a
    ks_ppm close to the moved share; empty-vs-dense bins stay finite
    thanks to smoothing."""
    from sales_forecast_mlops_at_scale_spark.operators.drift import psi_report

    ref = spark.createDataFrame([(0.0,)] * 100 + [(9.0,)] * 100, ["x"])
    cur = spark.createDataFrame([(0.0,)] * 200, ["x"])
    row = psi_report(ref, cur, ["x"], bins=10).collect()[0]
    assert row.ks_ppm == 500_000  # CDF gap of exactly 1/2 at bin 0
    assert row.psi > 0.25


def test_psi_multi_feature_and_degenerate_range(spark):
    """Multiple features come back as independent rows; a constant
    column (hi == lo) degenerates to one occupied bin without NaN/inf.
    Windows are EQUAL-SIZED here because Laplace smoothing gives
    unequal-sized windows slightly different smoothed shares even for
    identical shapes (p0 = (n+1)/(n+bins)) — a real, documented property
    of smoothed PSI, not a bug."""
    from sales_forecast_mlops_at_scale_spark.operators.drift import psi_report

    ref = spark.createDataFrame(
        [(float(i % 10), 5.0) for i in range(100)], ["a", "c"]
    )
    cur = spark.createDataFrame(
        [(float((i * 7) % 10), 5.0) for i in range(100)], ["a", "c"]
    )
    rows = {r.feature: r for r in psi_report(ref, cur, ["a", "c"]).collect()}
    assert set(rows) == {"a", "c"}
    assert rows["c"].psi == 0.0 and rows["c"].ks_ppm == 0
    # i%10 and (7i)%10 are both uniform over 0..9 → identical bin shares
    assert rows["a"].psi == 0.0 and rows["a"].ks_ppm == 0


def test_psi_report_split_equals_two_frame_path(spark):
    """psi_report_split (VERDICT r10 #4: the window indicator rides ONE
    scan, halving the audit's source reads) must produce IDENTICAL rows
    to the generic two-frame path on complementary slices — same bins,
    same exact integer counts, same fixed-point terms."""
    from pyspark.sql import functions as F

    from sales_forecast_mlops_at_scale_spark.operators.drift import (
        psi_report,
        psi_report_split,
    )

    rows = [
        (float(i % 13) + (0.5 if i % 2 else 0.0), float(i % 7), i % 3)
        for i in range(300)
    ]
    src = spark.createDataFrame(rows, "a double, b double, grp int")
    pred = F.col("grp") < 1  # ref = grp 0, cur = grp 1..2 (complementary)
    two = psi_report(
        src.where(pred), src.where(~pred), ["a", "b"], bins=7
    )
    one = psi_report_split(src, pred, ["a", "b"], bins=7)
    assert sorted(map(tuple, two.collect())) == sorted(
        map(tuple, one.collect())
    )
    # and NULL feature values still occupy the -1 bin on the split path
    src_n = src.withColumn(
        "a", F.when(F.col("grp") == 2, None).otherwise(F.col("a"))
    )
    got = {
        r.feature: r
        for r in psi_report_split(src_n, pred, ["a", "b"], bins=7).collect()
    }
    assert got["a"].psi > 0  # a third of cur went missing → drift
    # feature b untouched → bit-identical to the null-free run
    assert got["b"].psi == {r.feature: r for r in one.collect()}["b"].psi
    # NULL PREDICATE rows belong to NEITHER window — exactly like the
    # two-frame where(pred)/where(~pred) pair (code-review r11: the
    # first split draft defaulted them into the current window)
    src_np = src.withColumn(
        "grp", F.when(F.col("grp") == 2, None).otherwise(F.col("grp"))
    )
    pred_n = F.col("grp") < 1  # NULL for the former grp-2 rows
    two_n = psi_report(
        src_np.where(pred_n), src_np.where(~pred_n), ["a", "b"], bins=7
    )
    one_n = psi_report_split(src_np, pred_n, ["a", "b"], bins=7)
    assert sorted(map(tuple, two_n.collect())) == sorted(
        map(tuple, one_n.collect())
    )


def test_decayed_serving_equals_batch_on_fixture(spark):
    """The materialized decay state (3 real fold_batch commits) must
    serve the exact rows the batch operator computes from raw history —
    the registry pair (q_decayed_serving / q_decayed_counts) shares one
    oracle, this pins the same equality locally."""
    from sales_forecast_mlops_at_scale_spark.plans.analytics_queries import (
        q_decayed_counts,
        q_decayed_serving,
    )

    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, q_decayed_counts(spark, sf).collect()))
    b = sorted(map(tuple, q_decayed_serving(spark, sf).collect()))
    assert a == b


def test_drift_log_equals_per_epoch_batch_psi(spark):
    """The streaming monitor's parquet log (q_drift_log's fixture: two
    file-stream epochs through run_drift_monitor, exactly-once) must
    carry the EXACT rows batch psi_report computes per epoch slice —
    the decayed-counters serving pattern applied to the monitor
    (VERDICT r8 #2), pinned locally on top of the registry oracle."""
    from pyspark.sql import functions as F

    from sales_forecast_mlops_at_scale_spark.catalog import load_table
    from sales_forecast_mlops_at_scale_spark.operators.drift import psi_report
    from sales_forecast_mlops_at_scale_spark.plans.ml_queries import (
        _DRIFT_BINS,
        _DRIFT_COLS,
        _DRIFT_LOG_EPOCHS,
        _DRIFT_SPLIT,
        q_drift_log,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(map(tuple, q_drift_log(spark, sf).collect()))

    li = load_table(spark, sf, "lineitem")
    split = F.lit(_DRIFT_SPLIT).cast("date")
    ref = li.where(F.col("l_shipdate").cast("date") < split)
    cur = li.where(F.col("l_shipdate").cast("date") >= split)
    want = []
    for e in range(_DRIFT_LOG_EPOCHS):
        sliced = cur.where(F.col("l_orderkey") % _DRIFT_LOG_EPOCHS == e)
        for r in psi_report(
            ref, sliced, list(_DRIFT_COLS), bins=_DRIFT_BINS
        ).collect():
            want.append((e, *tuple(r)))
    assert got == sorted(want)


def test_psi_detects_null_rate_shift(spark):
    """A window whose feature silently went 50% NULL at an unchanged
    non-null distribution MUST register drift — NULLs are a real bin
    (code-review r8: the drop-nulls version reported psi = 0 here)."""
    from sales_forecast_mlops_at_scale_spark.operators.drift import psi_report

    ref = spark.createDataFrame(
        [(float(i % 10),) for i in range(200)], "x double"
    )
    cur = spark.createDataFrame(
        [((float(i % 10)) if i % 2 == 0 else None,) for i in range(200)],
        "x double",
    )
    row = psi_report(ref, cur, ["x"]).collect()[0]
    assert row.psi > 0.25  # the retrain band
    assert row.ks_ppm >= 400_000  # null mass is ~half the CDF gap
    assert row.n_cur == 200  # nulls are counted, not dropped
