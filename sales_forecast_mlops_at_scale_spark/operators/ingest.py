"""Batch ingest transforms: JSON parse chain and sales cleaning.

Covers SURVEY.md §2.2 P1-P3 (the streaming job's parse-project chain,
``/root/reference/services/airflow/dags/spark_streaming.py:71-76``) and the
producer-side cleaning P6/F1/F12 (``kafka_producer.py:28-33``,
``put_data_in_postgres.py:46-53``).  The same functions serve batch and
Structured Streaming inputs — a DataFrame transform is trigger-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import SALES_EVENT


def parse_json_events(
    raw: DataFrame,
    schema: T.StructType = SALES_EVENT,
    *,
    value_col: str = "value",
) -> DataFrame:
    """Binary/string JSON payloads → typed flat columns.

    Mirrors spark_streaming.py:71-76: CAST(value AS STRING) →
    ``from_json`` with the **declared** schema (never inference) →
    struct star-expansion.  Works identically on a batch frame and a
    ``readStream`` frame.
    """
    return (
        raw.select(F.col(value_col).cast("string").alias("__json"))
        .select(F.from_json("__json", schema).alias("data"))
        .select("data.*")
    )


def clean_sales(df: DataFrame, *, product_name: str | None = None) -> DataFrame:
    """Producer-side cleaning, relationally.

    - lowercase all column names (P6 — ``df.columns = map(str.lower, ...)``)
    - ``stateholiday`` force-cast to string (F1 — mixed 0/'0'/'a'/'b'/'c')
    - ``schoolholiday`` cast to string (schema unification, SURVEY §1.2)
    - optional constant ``productname`` (F12 — ``df['productname'] = lit``)
    - ``date`` string → DateType (F3)
    """
    out = df.toDF(*[c.lower() for c in df.columns])
    if "stateholiday" in out.columns:
        out = out.withColumn("stateholiday", F.col("stateholiday").cast("string"))
    if "schoolholiday" in out.columns:
        out = out.withColumn("schoolholiday", F.col("schoolholiday").cast("string"))
    if "date" in out.columns and dict(out.dtypes)["date"] == "string":
        out = out.withColumn("date", F.to_date("date"))
    if product_name is not None:
        out = out.withColumn("productname", F.lit(product_name))
    return out
