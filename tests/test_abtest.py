"""A/B experiment analysis: hand-verifiable statistics.

The registry differentials (q_ab_srm / q_ab_welch / q_ab_cuped) pin the
full pipeline against DuckDB; these tests pin the ALGEBRA itself
against independent numpy computations on a tiny constructed frame,
plus the period-split/cents quantization of experiment_frame.
"""

from __future__ import annotations

import numpy as np
import pytest

from sales_forecast_mlops_at_scale_spark.operators.abtest import (
    cuped_adjust,
    experiment_frame,
    srm_check,
    welch_ttest,
)


@pytest.fixture(scope="module")
def users(spark):
    rows = [
        # (user, pre_cents, post_cents, arm)
        (1, 100, 300, "control"),
        (2, 200, 500, "control"),
        (3, 0, 100, "control"),
        (4, 150, 700, "treatment"),
        (5, 50, 400, "treatment"),
        (6, 300, 900, "treatment"),
        (7, 120, 350, "treatment"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, pre_cents long, post_cents long, arm string"
    )


def test_srm_exact_chi_square(spark, users):
    row = srm_check(users).first()
    assert (row.n_control, row.n_treatment) == (3, 4)
    assert row.chi2 == round((3 - 4) ** 2 / 7, 6)
    assert row.srm_flag is False


def test_welch_matches_numpy(spark, users):
    c = np.array([300.0, 500.0, 100.0])
    t = np.array([700.0, 400.0, 900.0, 350.0])
    vc, vt = c.var(ddof=1), t.var(ddof=1)
    se2 = vc / len(c) + vt / len(t)
    tstat = (t.mean() - c.mean()) / np.sqrt(se2)
    df = se2**2 / (
        (vt / len(t)) ** 2 / (len(t) - 1) + (vc / len(c)) ** 2 / (len(c) - 1)
    )
    row = welch_ttest(users).first()
    assert row.n_control == 3 and row.n_treatment == 4
    assert row.mean_control_cents == round(c.mean(), 6)
    assert row.mean_treatment_cents == round(t.mean(), 6)
    assert row.var_control_cents == round(vc, 6)
    assert row.var_treatment_cents == round(vt, 6)
    assert row.t_stat == pytest.approx(tstat, abs=2e-6)
    assert row.welch_df == pytest.approx(df, abs=2e-6)


def test_cuped_matches_numpy_closed_form(spark, users):
    x = np.array([100.0, 200.0, 0.0, 150.0, 50.0, 300.0, 120.0])
    y = np.array([300.0, 500.0, 100.0, 700.0, 400.0, 900.0, 350.0])
    arms = np.array(["c", "c", "c", "t", "t", "t", "t"])
    theta = np.cov(x, y, ddof=1)[0, 1] / x.var(ddof=1)
    adj = y - theta * (x - x.mean())
    rows = {r.arm: r for r in cuped_adjust(users).collect()}
    for arm, tag in (("control", "c"), ("treatment", "t")):
        a = adj[arms == tag]
        assert rows[arm].n == len(a)
        assert rows[arm].mean_adj_cents == pytest.approx(a.mean(), abs=2e-6)
        assert rows[arm].var_adj_cents == pytest.approx(
            a.var(ddof=1), abs=2e-6
        )
    want_vr = 1.0 - adj.var(ddof=1) / y.var(ddof=1)
    assert rows["control"].var_reduction == pytest.approx(want_vr, abs=2e-6)
    # CUPED must not move the treatment CONTRAST (means shift equally up
    # to the covariate imbalance term, which the closed form preserves)
    raw_gap = y[arms == "t"].mean() - y[arms == "c"].mean()
    adj_gap = adj[arms == "t"].mean() - adj[arms == "c"].mean()
    got_gap = (
        rows["treatment"].mean_adj_cents - rows["control"].mean_adj_cents
    )
    assert got_gap == pytest.approx(adj_gap, abs=4e-6)
    # and the adjusted gap differs from raw only via theta * covariate gap
    x_gap = x[arms == "t"].mean() - x[arms == "c"].mean()
    assert adj_gap == pytest.approx(raw_gap - theta * x_gap, abs=1e-9)


def test_quantile_effects_match_numpy_linear(spark, users):
    from sales_forecast_mlops_at_scale_spark.operators.abtest import (
        quantile_effects,
    )

    c = np.array([300.0, 500.0, 100.0])
    t = np.array([700.0, 400.0, 900.0, 350.0])
    rows = {r.level: r for r in quantile_effects(users).collect()}
    assert sorted(rows) == [0.25, 0.5, 0.75, 0.9]
    for p, r in rows.items():
        qc = np.percentile(c, p * 100, method="linear")
        qt = np.percentile(t, p * 100, method="linear")
        assert r.q_control_cents == pytest.approx(qc, abs=1e-6)
        assert r.q_treatment_cents == pytest.approx(qt, abs=1e-6)
        assert r.qte_cents == pytest.approx(qt - qc, abs=1e-6)


def test_segment_effects_per_segment_welch_and_small_arm_filter(spark, users):
    from sales_forecast_mlops_at_scale_spark.operators.abtest import (
        segment_effects,
    )

    # users 1-3 control, 4-7 treatment; segment A gets 2+2 (kept),
    # segment B gets 1 control + 2 treatment (withheld: arm < 2)
    dim = spark.createDataFrame(
        [(1, "A"), (2, "A"), (4, "A"), (5, "A"), (3, "B"), (6, "B"), (7, "B")],
        "user_id long, segment string",
    )
    rows = segment_effects(users, dim).collect()
    assert [r.segment for r in rows] == ["A"]
    r = rows[0]
    c = np.array([300.0, 500.0])
    t = np.array([700.0, 400.0])
    assert (r.n_control, r.n_treatment) == (2, 2)
    assert r.mean_control_cents == c.mean()
    assert r.mean_treatment_cents == t.mean()
    assert r.lift_cents == t.mean() - c.mean()
    se2 = c.var(ddof=1) / 2 + t.var(ddof=1) / 2
    assert r.t_stat == pytest.approx((t.mean() - c.mean()) / np.sqrt(se2), abs=2e-6)


def test_experiment_frame_split_and_cents(spark):
    rows = [
        # pre-period purchases (days 1-5 of a 10-day span; split = day 6)
        (1, "2024-01-02 10:00:00", "purchase", 1.204),
        (1, "2024-01-03 10:00:00", "purchase", 2.301),
        # post-period purchase + ignored click
        (1, "2024-01-08 10:00:00", "purchase", 7.005),
        (1, "2024-01-09 10:00:00", "click", 99.0),
        # user with no purchases at all → (0, 0)
        (2, "2024-01-01 10:00:00", "click", 5.0),
        # span anchors
        (3, "2024-01-01 00:30:00", "view", 0.0),
        (3, "2024-01-10 23:30:00", "view", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, value double"
    ).selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value"
    )
    got = {
        r.user_id: (r.pre_cents, r.post_cents, r.arm)
        for r in experiment_frame(ev).collect()
    }
    # span Jan-1..Jan-10 → datediff 9 → split = Jan-1 + 4 = Jan-5
    # user 1: pre = round(120.4) + round(230.1) = 120 + 230 = 350 cents
    #         (quantization is PER EVENT, then exact bigint sums — the
    #         order-independence contract), post = round(700.5) = 701
    assert got[1][:2] == (350, 701)
    assert got[2][:2] == (0, 0)
    assert got[3][:2] == (0, 0)
    assert all(v[2] in ("control", "treatment") for v in got.values())


def test_ab_report_matches_individual_stats(spark, users):
    from sales_forecast_mlops_at_scale_spark.operators.abtest import ab_report

    rep = {
        (r.stat, r.metric): r.value for r in ab_report(users).collect()
    }
    assert len(rep) == 16
    srm = srm_check(users).first()
    assert rep[("srm", "n_control")] == float(srm.n_control)
    assert rep[("srm", "n_treatment")] == float(srm.n_treatment)
    assert rep[("srm", "chi2")] == srm.chi2
    assert rep[("srm", "srm_flag")] == float(srm.srm_flag)
    w = welch_ttest(users).first()
    assert rep[("welch", "mean_control_cents")] == w.mean_control_cents
    assert rep[("welch", "mean_treatment_cents")] == w.mean_treatment_cents
    assert rep[("welch", "var_control_cents")] == w.var_control_cents
    assert rep[("welch", "var_treatment_cents")] == w.var_treatment_cents
    assert rep[("welch", "t_stat")] == w.t_stat
    assert rep[("welch", "welch_df")] == w.welch_df
    cu = {r.arm: r for r in cuped_adjust(users).collect()}
    assert rep[("cuped", "mean_adj_control")] == cu["control"].mean_adj_cents
    assert rep[("cuped", "var_adj_control")] == cu["control"].var_adj_cents
    assert (
        rep[("cuped", "mean_adj_treatment")] == cu["treatment"].mean_adj_cents
    )
    assert rep[("cuped", "var_adj_treatment")] == cu["treatment"].var_adj_cents
    assert rep[("cuped", "var_reduction")] == cu["control"].var_reduction


def test_ab_report_full_matches_family_row_for_row(spark, users):
    """ab_report_full (VERDICT r10 #1) must agree EXACTLY with every
    per-statistic operator it folds in: the 16 core rows with
    ab_report, quantile rows with quantile_effects, segment rows with
    segment_effects — same inputs, same values, keyed long-form."""
    from sales_forecast_mlops_at_scale_spark.operators.abtest import (
        ab_report,
        ab_report_full,
        quantile_effects,
        segment_effects,
    )

    dim = spark.createDataFrame(
        [(1, "A"), (2, "A"), (4, "A"), (5, "A"), (3, "B"), (6, "B"), (7, "B")],
        "user_id long, segment string",
    )
    full = {
        (r.stat, r.metric): r.value
        for r in ab_report_full(users, dim).collect()
    }
    core = {
        (r.stat, r.metric): r.value for r in ab_report(users).collect()
    }
    assert {k: full[k] for k in core} == core

    qrows = quantile_effects(users).collect()
    assert len(qrows) == 4
    for r in qrows:
        lbl = f"p{int(round(r.level * 100))}"
        assert full[("quantile", f"{lbl}/q_control_cents")] == r.q_control_cents
        assert (
            full[("quantile", f"{lbl}/q_treatment_cents")] == r.q_treatment_cents
        )
        assert full[("quantile", f"{lbl}/qte_cents")] == r.qte_cents

    srows = segment_effects(users, dim).collect()
    assert [r.segment for r in srows] == ["A"]  # B withheld (arm < 2)
    for r in srows:
        s = r.segment
        assert full[("segment", f"{s}/n_control")] == float(r.n_control)
        assert full[("segment", f"{s}/n_treatment")] == float(r.n_treatment)
        assert (
            full[("segment", f"{s}/mean_control_cents")] == r.mean_control_cents
        )
        assert (
            full[("segment", f"{s}/mean_treatment_cents")]
            == r.mean_treatment_cents
        )
        assert full[("segment", f"{s}/lift_cents")] == r.lift_cents
        assert full[("segment", f"{s}/t_stat")] == r.t_stat
    # exact cardinality: 16 core + 12 quantile + 6 per surviving segment
    assert len(full) == 16 + 12 + 6 * len(srows)


def test_zero_variance_guards_withhold_not_nan(spark):
    from sales_forecast_mlops_at_scale_spark.operators.abtest import (
        segment_effects,
    )

    # both arms constant post metric → se2 = 0: t/df must be WITHHELD
    # (NULL), never an engine-specific inf/NaN (ADVICE r9)
    flat = spark.createDataFrame(
        [
            (1, 10, 500, "control"),
            (2, 20, 500, "control"),
            (3, 30, 500, "treatment"),
            (4, 40, 500, "treatment"),
        ],
        "user_id long, pre_cents long, post_cents long, arm string",
    )
    w = welch_ttest(flat).first()
    assert w.var_control_cents == 0.0 and w.var_treatment_cents == 0.0
    assert w.t_stat is None and w.welch_df is None
    assert w.mean_control_cents == 500.0

    # the zero-variance segment is withheld; the varying one survives
    users2 = spark.createDataFrame(
        [
            (1, 10, 500, "control"),
            (2, 20, 500, "control"),
            (3, 30, 500, "treatment"),
            (4, 40, 500, "treatment"),
            (5, 10, 100, "control"),
            (6, 20, 300, "control"),
            (7, 30, 600, "treatment"),
            (8, 40, 900, "treatment"),
        ],
        "user_id long, pre_cents long, post_cents long, arm string",
    )
    dim = spark.createDataFrame(
        [(i, "FLAT" if i <= 4 else "VARY") for i in range(1, 9)],
        "user_id long, segment string",
    )
    segs = segment_effects(users2, dim).collect()
    assert [r.segment for r in segs] == ["VARY"]

    # constant pre-period covariate → var(x) = 0 → theta falls back to
    # 0 (plain means), not inf/NaN
    const_x = spark.createDataFrame(
        [
            (1, 7, 100, "control"),
            (2, 7, 300, "control"),
            (3, 7, 600, "treatment"),
            (4, 7, 900, "treatment"),
        ],
        "user_id long, pre_cents long, post_cents long, arm string",
    )
    rows = {r.arm: r for r in cuped_adjust(const_x).collect()}
    # theta = 0 → adjusted means are the raw means, var_reduction = 0
    assert rows["control"].mean_adj_cents == 200.0
    assert rows["treatment"].mean_adj_cents == 750.0
    assert rows["control"].var_reduction == 0.0


def test_bigint_overflow_raises_loudly(spark):
    """The overflow contract (ADVICE r9, adjudicated by probe): this
    engine runs ANSI mode, so a moment sum that exceeds bigint raises
    SparkArithmeticException inside the aggregation — the same loud
    failure DuckDB gives the oracle twin — rather than wrapping
    silently.  No extra conservative guard is layered on top (an
    earlier draft rejected inputs both engines handle — code-review
    r10); this test pins the raise so an ANSI-off regression cannot
    reintroduce silent wraps."""
    big = 2**62
    frame = spark.createDataFrame(
        [(1, 0, big, "control"), (2, 0, big, "control"),
         (3, 0, big, "treatment"), (4, 0, big, "treatment")],
        "user_id long, pre_cents long, post_cents long, arm string",
    )
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        welch_ttest(frame).collect()
