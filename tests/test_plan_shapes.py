"""Physical-plan audits: the optimizations the engine is designed around
must actually appear in the executed plans — broadcasts on dimension
joins, filter/column pushdown into the parquet scan, top-k as
TakeOrderedAndProject, and (regression for the round-1 verdict) no
single-partition global window in the forecast id stamping."""

from __future__ import annotations

from sales_forecast_mlops_at_scale_spark.plans import all_queries

from .conftest import SMOKE_SF_DIR


def _executed_plan(df) -> str:
    df.count()  # materialize so AQE finalizes the plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_q3_broadcasts_dimension_side(spark):
    q = all_queries()["q3_shipping_priority"]
    plan = _executed_plan(q.fn(spark, SMOKE_SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_filter_pushdown_reaches_parquet_scan(spark):
    q = all_queries()["q_group_slice"]
    plan = _executed_plan(q.fn(spark, SMOKE_SF_DIR))
    assert "PushedFilters: [" in plan
    # at least one concrete predicate pushed (not the empty list)
    assert "PushedFilters: []" not in plan.split("PushedFilters", 1)[1][:200]


def test_column_pruning_reaches_parquet_scan(spark):
    # q1 touches a handful of lineitem columns; the scan must not read
    # the full 16-column schema
    q = all_queries()["q1_pricing_summary"]
    plan = _executed_plan(q.fn(spark, SMOKE_SF_DIR))
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "l_orderkey" not in read_schema, read_schema  # unused column pruned
    assert "l_quantity" in read_schema


def test_topn_plans_take_ordered(spark):
    q = all_queries()["q_topn_recent"]
    plan = _executed_plan(q.fn(spark, SMOKE_SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan


def test_run_weekly_has_no_global_window_exchange(spark):
    # round-1 verdict item 2: the surrogate-id stamping must not funnel
    # the forecast output through a single-partition sort/Exchange
    from sales_forecast_mlops_at_scale_spark.fixtures import synthetic_sales
    from sales_forecast_mlops_at_scale_spark.pipeline import run_weekly
    from sales_forecast_mlops_at_scale_spark.session import FIXED_CLOCK

    sales = synthetic_sales(spark, n_stores=4, n_days=60, as_of=FIXED_CLOCK.as_of)
    _metrics, forecasts = run_weekly(sales, clock=FIXED_CLOCK)
    exec_plan = _executed_plan(forecasts)
    assert "Exchange SinglePartition" not in exec_plan, exec_plan
