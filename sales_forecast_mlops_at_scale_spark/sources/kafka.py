"""Kafka batch source/sink (SURVEY.md S3/S4).

Mirrors the reference's Kafka edges — producer
(``kafka_producer.py:45-62``: JSON-serialize each row, send to topic) and
consumer (``spark_streaming.py:45-53``) — as Spark's native Kafka batch
connector.  The streaming twin lives in ``streaming/ingest.py``.

Requires ``spark-sql-kafka-0-10`` on the classpath and a reachable
broker; neither exists in the test container, so these are exercised by
construction-only tests and documented for cluster use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_kafka_batch(
    spark: SparkSession,
    *,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
) -> DataFrame:
    """One bounded read of a topic: raw ``value`` strings."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", ending_offsets)
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
    )


def write_kafka_batch(
    df: DataFrame,
    *,
    bootstrap_servers: str,
    topic: str,
) -> None:
    """JSON-serialize every row into the topic (the producer's
    ``json.dumps`` + ``send`` loop, distributed)."""
    (
        df.select(F.to_json(F.struct(*df.columns)).alias("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )
