"""Incremental retraining tier (ml/incremental.py): output must always be
bit-identical to a full retrain, while the amount of actual training work
tracks the CHURN, not the group count — plus the state-tier lifecycle
(pointer commit, params invalidation, torn-generation ignorance)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from sales_forecast_mlops_at_scale_spark.ml import incremental_train, train_groups

KEYS = ("store", "productname")


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def sales(spark):
    """Small deterministic multi-group sales frame (3 stores × 2 products,
    40 days) — tiny enough that each test retrains in well under a second."""
    rows = []
    start = dt.date(2025, 1, 1)
    for store in (1, 2, 3):
        for prod in ("a", "b"):
            for i in range(40):
                rows.append(
                    (store, prod, start + dt.timedelta(days=i),
                     float(10 * store + (i % 7) + (1 if prod == "b" else 0)))
                )
    return spark.createDataFrame(
        rows, "store int, productname string, date date, sales double"
    )


def _inc(sales, root, **kw):
    stats: dict = {}
    out = incremental_train(
        sales, str(root), KEYS, model_spec="seasonal_naive",
        date_col="date", y_col="sales", stats=stats, **kw,
    )
    return out, stats


def test_cold_run_equals_full_retrain(spark, sales, tmp_path):
    full = train_groups(
        sales, KEYS, model_spec="seasonal_naive", date_col="date", y_col="sales"
    )
    out, stats = _inc(sales, tmp_path / "state")
    assert _canon(out) == _canon(full)
    assert stats == {"n_stale": 6, "n_groups": 6, "n_carried": 0}


def test_warm_run_retrains_nothing(spark, sales, tmp_path):
    root = tmp_path / "state"
    first, _ = _inc(sales, root)
    expected = _canon(first)
    again, stats = _inc(sales, root)
    assert _canon(again) == expected
    assert stats["n_stale"] == 0 and stats["n_carried"] == 6


def test_churn_retrains_only_changed_groups(spark, sales, tmp_path):
    root = tmp_path / "state"
    _inc(sales, root)
    # append one new day to exactly one group: only it goes stale
    extra = spark.createDataFrame(
        [(2, "a", dt.date(2025, 2, 10), 99.0)],
        "store int, productname string, date date, sales double",
    )
    mutated = sales.unionByName(extra)
    out, stats = _inc(mutated, root)
    assert stats["n_stale"] == 1 and stats["n_carried"] == 5
    full = train_groups(
        mutated, KEYS, model_spec="seasonal_naive", date_col="date", y_col="sales"
    )
    assert _canon(out) == _canon(full)


def test_value_change_same_rowcount_detected(spark, sales, tmp_path):
    """An UPDATE (same row count, different y) must move the content
    fingerprint — the failure mode a count-only fingerprint misses."""
    root = tmp_path / "state"
    _inc(sales, root)
    mutated = sales.withColumn(
        "sales",
        F.when(
            (F.col("store") == 3)
            & (F.col("productname") == "b")
            & (F.col("date") == dt.date(2025, 1, 15)),
            F.col("sales") + 5.0,
        ).otherwise(F.col("sales")),
    )
    out, stats = _inc(mutated, root)
    assert stats["n_stale"] == 1
    full = train_groups(
        mutated, KEYS, model_spec="seasonal_naive", date_col="date", y_col="sales"
    )
    assert _canon(out) == _canon(full)


def test_even_multiplicity_swap_detected(spark, sales, tmp_path):
    """XOR alone cancels on even-multiplicity multiset swaps — replacing
    a duplicated row PAIR {h,h} with a different duplicated pair {g,g}
    keeps the count and the XOR identical; the sum fingerprint must
    still mark the group stale so the carried metrics never go stale."""
    dup = spark.createDataFrame(
        [(99, "z", dt.date(2025, 1, d), v)
         for d, v in [(1, 10.0), (2, 7.0), (2, 7.0), (3, 4.0)]],
        "store int, productname string, date date, sales double",
    )
    base = sales.unionByName(dup)
    root = tmp_path / "state"
    _inc(base, root)

    swapped = spark.createDataFrame(
        [(99, "z", dt.date(2025, 1, d), v)
         for d, v in [(1, 10.0), (2, 8.0), (2, 8.0), (3, 4.0)]],
        "store int, productname string, date date, sales double",
    )
    mutated = sales.unionByName(swapped)
    out, stats = _inc(mutated, root)
    assert stats["n_stale"] == 1  # the swap is SEEN despite XOR cancel
    full = train_groups(
        mutated, KEYS, model_spec="seasonal_naive", date_col="date", y_col="sales"
    )
    assert _canon(out) == _canon(full)


def test_vanished_group_dropped(spark, sales, tmp_path):
    root = tmp_path / "state"
    _inc(sales, root)
    shrunk = sales.filter(~((F.col("store") == 1) & (F.col("productname") == "a")))
    out, stats = _inc(shrunk, root)
    assert stats == {"n_stale": 0, "n_groups": 5, "n_carried": 5}
    assert out.count() == 5
    assert out.filter((F.col("store") == 1) & (F.col("productname") == "a")).count() == 0


def test_params_change_invalidates_state(spark, sales, tmp_path):
    root = tmp_path / "state"
    _inc(sales, root)
    out, stats = _inc(sales, root, n_splits=3)
    assert stats["n_stale"] == 6  # stored tier trained with n_splits=5
    full = train_groups(
        sales, KEYS, model_spec="seasonal_naive", n_splits=3,
        date_col="date", y_col="sales",
    )
    assert _canon(out) == _canon(full)


def test_torn_generation_is_never_read(spark, sales, tmp_path):
    """A generation directory without a committed pointer (crash between
    write and os.replace) must be invisible: the next run reads the old
    generation and still produces the full-retrain answer."""
    root = tmp_path / "state"
    first, _ = _inc(sales, root)
    ptr = (root / "_CURRENT").read_text()
    # fake a crashed writer: a newer gen dir exists but the pointer was
    # never swapped
    torn = root / "gen-dead-beef"
    (torn / "metrics").mkdir(parents=True)
    (torn / "metrics" / "junk.parquet").write_bytes(b"not parquet")
    out, stats = _inc(sales, root)
    assert stats["n_stale"] == 0
    assert _canon(out) == _canon(first)
    # quiescent run: no new commit, the old pointer stands
    assert (root / "_CURRENT").read_text() == ptr


def test_quiescent_run_publishes_nothing(spark, sales, tmp_path):
    root = tmp_path / "state"
    _inc(sales, root)
    gens = {p.name for p in root.iterdir() if p.name.startswith("gen-")}
    _inc(sales, root)
    assert {p.name for p in root.iterdir() if p.name.startswith("gen-")} == gens


def test_fingerprints_mergeable_from_deltas(spark, sales):
    """fingerprint(full) == fold of delta contributions, in any order —
    the property that lets an ingest path maintain the fingerprint table
    from CDC batches without rescanning history."""
    from sales_forecast_mlops_at_scale_spark.ml import (
        delta_fingerprints,
        merge_fingerprints,
        series_fingerprints,
    )

    full = series_fingerprints(sales, KEYS, date_col="date", y_col="sales")
    # split arbitrarily (not on group boundaries) and fold in either order
    part1 = sales.filter(F.dayofmonth("date") <= 13)
    part2 = sales.filter(F.dayofmonth("date") > 13)
    d1 = delta_fingerprints(part1, KEYS, date_col="date", y_col="sales")
    d2 = delta_fingerprints(part2, KEYS, date_col="date", y_col="sales")
    for a, b in ((d1, d2), (d2, d1)):
        merged = merge_fingerprints(a, b, KEYS)
        assert _canon(merged) == _canon(full)


def test_fingerprint_delete_retracts_exactly(spark, sales):
    """A delete batch (op=-1) must return the fingerprint to what a scan
    of the reduced data produces; deleting a whole group vanishes it."""
    from sales_forecast_mlops_at_scale_spark.ml import (
        delta_fingerprints,
        merge_fingerprints,
        series_fingerprints,
    )

    base = series_fingerprints(sales, KEYS, date_col="date", y_col="sales")
    doomed_rows = sales.filter(
        ((F.col("store") == 2) & (F.col("productname") == "b") & (F.dayofmonth("date") <= 3))
        | ((F.col("store") == 1) & (F.col("productname") == "a"))
    )
    retract = delta_fingerprints(
        doomed_rows.withColumn("op", F.lit(-1)),
        KEYS, date_col="date", y_col="sales", op_col="op",
    )
    merged = merge_fingerprints(base, retract, KEYS)
    survivor_truth = series_fingerprints(
        sales.exceptAll(doomed_rows), KEYS, date_col="date", y_col="sales"
    )
    assert _canon(merged) == _canon(survivor_truth)
    assert merged.filter((F.col("store") == 1) & (F.col("productname") == "a")).count() == 0


def test_generation_gc_keeps_two(spark, sales, tmp_path):
    """Each churn run publishes a generation; GC retains the committed one
    plus its predecessor (reader grace window), dropping older ones."""
    root = tmp_path / "state"
    cur = sales
    for day in (dt.date(2025, 3, 1), dt.date(2025, 3, 2), dt.date(2025, 3, 3)):
        extra = spark.createDataFrame(
            [(1, "a", day, 42.0)],
            "store int, productname string, date date, sales double",
        )
        cur = cur.unionByName(extra)
        out, _ = _inc(cur, root)
    gens = [p.name for p in root.iterdir() if p.name.startswith("gen-")]
    assert len(gens) == 2
    assert (root / "_CURRENT").read_text() in gens
    # the surviving committed generation answers correctly
    full = train_groups(
        cur, KEYS, model_spec="seasonal_naive", date_col="date", y_col="sales"
    )
    assert _canon(out) == _canon(full)
