"""Unit tests for the plan-keyed cache registry (cache.py): slot reuse,
keyless persist tracking, and driver-side plan memoization."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_forecast_mlops_at_scale_spark.cache import (
    _KEYLESS,
    _MEMO,
    _plan_key,
    clear_slots,
    derived_key,
    persist_slot,
    plan_memo,
    track_keyless,
)

from sales_forecast_mlops_at_scale_spark.catalog import load_table

from .conftest import SF_DIR


def test_plan_key_stable_across_invocations(spark):
    a = load_table(spark, SF_DIR, "embeddings")
    b = load_table(spark, SF_DIR, "embeddings")
    assert _plan_key(a) == _plan_key(b)
    # a different projection keys differently
    c = load_table(spark, SF_DIR, "embeddings").select("vec_id")
    assert _plan_key(a) != _plan_key(c)


def test_persist_slot_reuses_and_evicts(spark):
    clear_slots()
    a = load_table(spark, SF_DIR, "embeddings").select("vec_id")
    first = persist_slot("t.slot", a)
    again = persist_slot(
        "t.slot", load_table(spark, SF_DIR, "embeddings").select("vec_id")
    )
    assert again is first  # same semantic plan -> the SAME cached frame
    other = persist_slot(
        "t.slot", load_table(spark, SF_DIR, "documents").select("doc_id")
    )
    assert other is not first  # different plan evicts and takes the slot
    clear_slots()


def test_track_keyless_released_by_clear_slots(spark):
    clear_slots()
    df = track_keyless(spark.range(10))
    df.count()
    assert df.storageLevel.useMemory and len(_KEYLESS) == 1
    clear_slots()
    assert not _KEYLESS
    assert not df.storageLevel.useMemory  # actually unpersisted


def test_plan_memo_hits_on_same_key_only(spark):
    clear_slots()
    base = _plan_key(load_table(spark, SF_DIR, "embeddings"))
    builds = []

    def builder():
        out = spark.range(5).withColumn("x", F.col("id") * 2)
        builds.append(out)
        return out

    k1 = derived_key(base, "memo-test", 1)
    first = plan_memo(k1, builder)
    assert plan_memo(k1, builder) is first and len(builds) == 1
    # different params -> rebuild; None key -> always build
    plan_memo(derived_key(base, "memo-test", 2), builder)
    plan_memo(None, builder)
    assert len(builds) == 3
    clear_slots()
    assert not _MEMO


def test_value_memo_session_checked_and_cleared(spark):
    from sales_forecast_mlops_at_scale_spark.cache import _MEMO, value_memo

    clear_slots()
    base = _plan_key(load_table(spark, SF_DIR, "embeddings"))
    builds = []

    def builder():
        builds.append(1)
        return ([("a", "b")], "payload")

    k = derived_key(base, "vmemo-test", 7)
    first = value_memo(k, builder, session=spark)
    assert value_memo(k, builder, session=spark) is first and len(builds) == 1
    # a different owning session must NOT be served this session's value
    sentinel = object()
    value_memo(k, builder, session=sentinel)
    assert len(builds) == 2
    # None key -> always build; clear_slots drops everything
    value_memo(None, builder, session=spark)
    assert len(builds) == 3
    clear_slots()
    assert not _MEMO
