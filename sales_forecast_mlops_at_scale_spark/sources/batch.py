"""Batch file sources/sinks with declared schemas.

The reference seeds from CSV via pandas (S1/S2,
``put_data_in_postgres.py:25``, ``kafka_producer.py:42``) and bulk-inserts
with ``to_sql`` (S7).  Here: Spark's distributed readers with **declared**
StructTypes (schema inference is banned for canonical tables, SURVEY.md
§1.3) and date-partitioned parquet writes so later date predicates prune
partitions instead of scanning history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
) -> DataFrame:
    """CSV scan with declared schema (S1/S2).  Column pruning + predicate
    pushdown apply; malformed rows fail loudly (PERMISSIVE hides data
    corruption at scale)."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines scan with declared schema — the batch twin of the
    streaming source (S3)."""
    return spark.read.schema(schema).json(path)


def write_table(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] = (),
    mode: str = "append",
) -> None:
    """Parquet table write (S5/S7/S9 analog).  ``mode='overwrite'`` is the
    reference's drop-and-recreate (S9); ``'append'`` its ``if_exists=
    'append'`` inserts (S7)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (column pruning + predicate pushdown, same as parquet —
    ORC is the second columnar format warehouses standardize on)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] = (),
    mode: str = "append",
) -> None:
    """ORC table write — interchange path for Hive/Trino-era warehouses."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
