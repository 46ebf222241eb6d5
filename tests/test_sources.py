"""Batch source/sink tests: declared-schema CSV/JSONL scans (FAILFAST),
parquet and ORC round-trips with partition layout, and pushdown reaching
the columnar scans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sales_forecast_mlops_at_scale_spark.sources.batch import (
    read_csv,
    read_jsonl,
    read_orc,
    write_orc,
    write_table,
)

SCHEMA = T.StructType(
    [
        T.StructField("store", T.IntegerType()),
        T.StructField("date", T.DateType()),
        T.StructField("sales", T.IntegerType()),
    ]
)


def test_read_csv_declared_schema_failfast(spark, tmp_path):
    p = tmp_path / "sales.csv"
    p.write_text("store,date,sales\n1,2026-01-01,100\n2,2026-01-02,200\n")
    df = read_csv(spark, str(p), SCHEMA)
    assert df.schema == SCHEMA
    assert df.count() == 2

    bad = tmp_path / "bad.csv"
    bad.write_text("store,date,sales\nnot_an_int,2026-01-01,100\n")
    with pytest.raises(Exception):  # FAILFAST surfaces corruption loudly
        read_csv(spark, str(bad), SCHEMA).collect()


def test_read_jsonl_declared_schema(spark, tmp_path):
    p = tmp_path / "sales.json"
    p.write_text('{"store": 1, "date": "2026-01-01", "sales": 100}\n')
    df = read_jsonl(spark, str(p), SCHEMA)
    assert df.schema == SCHEMA
    row = df.collect()[0]
    assert (row.store, row.sales) == (1, 100)


def test_parquet_partitioned_roundtrip_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "2026-01-01", 100), (2, "2026-01-02", 200)],
        "store int, date string, sales int",
    ).withColumn("date", F.to_date("date"))
    path = str(tmp_path / "t")
    write_table(df, path, partition_by=["date"], mode="overwrite")
    back = spark.read.parquet(path)
    assert back.count() == 2
    pruned = back.filter(F.col("date") == "2026-01-01")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == 1
    assert "PartitionFilters: [" in plan and "PartitionFilters: []" not in plan


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "k int, v int"
    )
    path = str(tmp_path / "orc_t")
    write_orc(df, path, mode="overwrite")
    back = read_orc(spark, path)
    assert back.count() == 100
    filtered = back.filter(F.col("k") > 90).select("v")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), GreaterThan(k,90)]" in plan
    assert filtered.count() == 9


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """mergeSchema read across generations: an appended column appears
    for new files and nulls out for old ones — the additive-evolution
    contract a long-lived warehouse table depends on."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(
        base + "/gen=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.parquet(base + "/gen=2")
    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) == {"id", "v", "score", "gen"}
    rows = {r.id: (r.score, r.gen) for r in df.collect()}
    assert rows[1] == (None, 1)
    assert rows[2] == (9.5, 2)
