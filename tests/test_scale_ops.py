"""Scale-engineering operator tests: salted-join equivalence under skew,
hot-key probe, and bucketed-layout joins planning with zero Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sales_forecast_mlops_at_scale_spark.operators.scale import (
    salted_join,
    top_keys,
    write_bucketed,
)


@pytest.fixture()
def skewed(spark):
    # 90% of rows on key 1, the rest spread over 2..10
    left = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, 1).otherwise((F.col("id") % 9 + 2)).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(1, 11)], "k int, name string"
    )
    return left, right


def test_salted_join_matches_plain_join(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k").select("k", "v", "name")
    salted = salted_join(left, right, ["k"], n_salts=4).select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark, skewed):
    left, right = skewed
    right_partial = right.filter(F.col("k") <= 5)
    out = salted_join(left, right_partial, ["k"], n_salts=4, how="left")
    plain = left.join(right_partial, "k", "left")
    assert out.count() == plain.count()
    assert out.filter(F.col("name").isNull()).count() == plain.filter(
        F.col("name").isNull()
    ).count()


def test_salted_join_rejects_right_outer(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, ["k"], how="right")


def test_top_keys_finds_hot_key(spark, skewed):
    left, _ = skewed
    hot = top_keys(left, ["k"], n=3).collect()
    assert hot[0].k == 1 and hot[0].n_rows == 1800
    assert len(hot) == 3


def test_bucketed_join_plans_without_exchange(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts must
    join with NO Exchange in the plan — the pre-paid-shuffle contract."""
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(
        a, "bkt_a", bucket_by=["k"], n_buckets=4, sort_by=["k"],
        path=str(tmp_path / "bkt_a"),
    )
    write_bucketed(
        b, "bkt_b", bucket_by=["k"], n_buckets=4, sort_by=["k"],
        path=str(tmp_path / "bkt_b"),
    )
    # disable broadcast so the sort-merge path (where bucketing matters)
    # is what gets planned — tiny test tables would otherwise broadcast
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        rows = joined.collect()  # materialize so AQE finalizes THIS plan
        assert len(rows) == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # shuffle pre-paid by bucketing
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_bloom_prefilter_no_false_negatives_and_fp_rate(spark):
    from pyspark.sql import functions as F

    from sales_forecast_mlops_at_scale_spark.operators.scale import (
        bloom_prefilter,
        bloom_prefilter_audit,
    )

    build = spark.createDataFrame(
        [(f"member-{i}",) for i in range(50)], "v string"
    )
    probe = spark.createDataFrame(
        [(f"member-{i}",) for i in range(50)]
        + [(f"other-{i}",) for i in range(500)],
        "v string",
    )
    out = bloom_prefilter(probe, build, probe_col="v", build_col="v", m=512, k=3)
    rows = {r.v: r.bloom_pass for r in out.collect()}
    # zero false negatives: every true member passes
    assert all(rows[f"member-{i}"] for i in range(50))
    # FP rate near theory: (1 - e^{-kn/m})^k ~ 0.017 for 512/3/50
    fps = sum(1 for i in range(500) if rows[f"other-{i}"])
    assert fps < 25  # << 500: the filter actually filters
    audit = bloom_prefilter_audit(
        probe, build, probe_col="v", build_col="v", m=512, k=3
    ).collect()[0]
    assert audit.n_probe == 550
    assert audit.n_exact == 50
    assert audit.n_false_pos == fps
    assert audit.n_bloom_pass == 50 + fps


def test_persist_slot_reuses_identical_plan_and_evicts_stale(spark):
    from sales_forecast_mlops_at_scale_spark import cache as pc

    pc.clear_slots()
    a1 = spark.range(100).selectExpr("id", "id * 2 AS y")
    a2 = spark.range(100).selectExpr("id", "id * 2 AS y")  # same plan
    b = spark.range(100).selectExpr("id", "id * 3 AS y")  # different plan
    c1 = pc.persist_slot("t.slot", a1)
    c2 = pc.persist_slot("t.slot", a2)
    assert c2 is c1, "semantically identical plan must reuse the live cache"
    c3 = pc.persist_slot("t.slot", b)
    assert c3 is not c1, "a different plan must take over the slot"
    assert c3.count() == 100 and c3.filter("y = 9").count() == 1
    # only ONE live cache for the slot (bounded memory)
    assert pc._LIVE["t.slot"][2] is c3
    pc.clear_slots()
    assert not pc._LIVE


def test_persist_slot_repins_after_external_clear_cache(spark):
    from sales_forecast_mlops_at_scale_spark import cache as pc

    pc.clear_slots()
    df = spark.range(50).selectExpr("id", "id * 5 AS y")
    c1 = pc.persist_slot("t.repin", df)
    c1.count()
    spark.catalog.clearCache()  # external wipe behind the registry's back
    c2 = pc.persist_slot("t.repin", spark.range(50).selectExpr("id", "id * 5 AS y"))
    assert c2.storageLevel.useMemory or c2.storageLevel.useDisk
    assert c2.count() == 50
    pc.clear_slots()


def test_adaptive_salted_join_matches_plain_and_salts_only_hot(spark, skewed):
    """adaptive_salted_join must (a) equal the plain join row-for-row,
    (b) spread the probed hot key across multiple partitions under a
    forced shuffle join while cold keys keep the constant salt, and
    (c) pass through untouched (same plan, no salt column machinery)
    when the probe finds no key over the share threshold."""
    from sales_forecast_mlops_at_scale_spark.operators.scale import (
        adaptive_salted_join,
    )

    left, right = skewed
    plain = sorted(
        map(tuple, left.join(right, "k").select("k", "v", "name").collect())
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "false",
    }
    prior = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        out = adaptive_salted_join(
            left, right, ["k"], n_salts=4, min_share_ppm=500_000
        )
        got = out.select("k", "v", "name")
        pids = out.withColumn("pid", F.spark_partition_id())
        hot_pids = pids.where(F.col("k") == 1).select("pid").distinct().count()
        cold_pids = (
            pids.where(F.col("k") != 1)
            .select("k", "pid")
            .groupBy("k")
            .agg(F.countDistinct("pid").alias("n"))
            .agg(F.max("n"))
            .collect()[0][0]
        )
        assert sorted(map(tuple, got.collect())) == plain
        assert hot_pids > 1  # the 90% key is split across tasks
        assert cold_pids == 1  # constant salt: cold keys stay single-task
    finally:
        for k, v in prior.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
    # (c) balanced data -> the exact plain join, no salt in the plan
    balanced = spark.range(0, 1000).select(
        (F.col("id") % 100).cast("int").alias("k"), F.col("id").alias("v")
    )
    out2 = adaptive_salted_join(balanced, right, ["k"], min_share_ppm=500_000)
    assert "__salt" not in out2._jdf.queryExecution().analyzed().toString()
    assert out2.count() == balanced.join(right, "k").count()


def test_group_skew_report_exact_order_statistics(spark):
    """Hand-computed fixture: 10 groups with sizes 1..9 and one hot
    group of 81 rows (half of all 162 rows).  p50 over 11 sizes is the
    6th smallest (= 6), p99 the 11th (= 81), max_share_ppm = 81e6 div
    162 = 500000 exactly — all exact integers."""
    from sales_forecast_mlops_at_scale_spark.operators.scale import (
        group_skew_report,
    )

    rows = []
    for g in range(1, 10):  # groups 1..9, sizes 1..9 (45 rows)
        rows += [(g,)] * g
    rows += [(10,)] * 36  # pad: sizes {1..9, 36, 81}, total 162
    rows += [(11,)] * 81  # the hot key: half of all rows
    df = spark.createDataFrame(rows, "k int")
    out = group_skew_report(df, ["k"]).collect()[0]
    assert out.n_groups == 11
    assert out.total_rows == 162
    assert out.p50_size == 6  # ceil(11/2) = 6th smallest of 1..9,36,81
    assert out.p99_size == 81  # ceil(0.99*11) = 11th
    assert out.max_size == 81
    assert out.max_share_ppm == 500_000  # exactly half


def test_group_skew_report_uniform_groups(spark):
    """Uniform groups: every quantile equals the common size and the
    max share is 10^6 / n_groups (the healthy baseline the docstring
    tells operators to expect)."""
    from sales_forecast_mlops_at_scale_spark.operators.scale import (
        group_skew_report,
    )

    df = spark.range(0, 400).select((F.col("id") % 8).alias("k"))
    out = group_skew_report(df, ["k"]).collect()[0]
    assert (out.n_groups, out.total_rows) == (8, 400)
    assert out.p50_size == out.p99_size == out.max_size == 50
    assert out.max_share_ppm == 125_000  # 1e6 / 8
