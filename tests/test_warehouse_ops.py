"""SCD2 merge and incremental-rollup operator semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sales_forecast_mlops_at_scale_spark.operators.warehouse import (
    merge_rollup,
    scd2_merge,
)


def test_scd2_merge_versions(spark):
    current = spark.createDataFrame(
        [
            (1, "A", dt.date(2026, 1, 1), None),      # will change to B
            (2, "A", dt.date(2026, 1, 1), None),      # no-op update (same attr)
            (3, "C", dt.date(2026, 1, 1), None),      # no update at all
            (1, "Z", dt.date(2025, 1, 1), dt.date(2026, 1, 1)),  # closed history
        ],
        "k int, seg string, valid_from date, valid_to date",
    )
    updates = spark.createDataFrame(
        [(1, "B", dt.date(2026, 2, 1)), (2, "A", dt.date(2026, 2, 1))],
        "k int, seg string, effective_date date",
    )
    out = scd2_merge(current, updates, key=["k"], attrs=["seg"])
    rows = {(r.k, r.seg, r.valid_from, r.valid_to) for r in out.collect()}
    assert rows == {
        (1, "Z", dt.date(2025, 1, 1), dt.date(2026, 1, 1)),   # history untouched
        (1, "A", dt.date(2026, 1, 1), dt.date(2026, 2, 1)),   # closed
        (1, "B", dt.date(2026, 2, 1), None),                  # new open version
        (2, "A", dt.date(2026, 1, 1), None),                  # no-op stays open
        (3, "C", dt.date(2026, 1, 1), None),                  # untouched
    }
    # exactly one open row per key
    opens = out.filter(F.col("valid_to").isNull()).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in opens)


def test_merge_rollup_equals_full_recompute(spark):
    facts = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("a", 4), ("b", 5), ("c", 6)],
        "k string, v long",
    )
    old, new = facts.filter("v <= 3"), facts.filter("v > 3")
    existing = old.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("v")
    )
    merged = merge_rollup(existing, new, keys=["k"], sum_cols=["v"])
    full = facts.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"), F.sum("v").alias("v")
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
