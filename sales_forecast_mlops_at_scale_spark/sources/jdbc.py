"""JDBC source/sink (SURVEY.md S5/S6/S8).

The reference reads its tables through SQLAlchemy ORM sessions
(``training-service/app/db_utils.py:23-38``) — whole rows materialized
then pruned in Python — and appends via ``df.write.jdbc``
(``spark_streaming.py:79-97``).  Spark's JDBC source pushes filters and
prunes columns server-side, and ``partition_column`` bounds give a
parallel read instead of one connection streaming the whole table.

Needs a JDBC driver jar + reachable database; construction-only tested
in this container.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    *,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """Parallel JDBC scan.  With ``partition_column`` (a numeric/date
    surrogate like the reference's ``id``), Spark issues ``num_partitions``
    range-bounded queries concurrently."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_jdbc_append(
    df: DataFrame,
    *,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
) -> None:
    """Append rows (the reference's foreachBatch body, S5).  For
    exactly-once streaming semantics wrap with
    ``streaming.ingest.idempotent_append_batch``-style key filtering or a
    transactional staging table."""
    df.write.jdbc(url=url, table=table, mode="append", properties=properties or {})
