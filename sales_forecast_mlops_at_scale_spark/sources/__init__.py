"""Sources & sinks (SURVEY.md §2.1 S1-S11).

Batch readers/writers are thin, schema-enforcing wrappers; Kafka and JDBC
connectors mirror the reference's edges and are constructed lazily so the
package imports cleanly in environments without those services."""

from .batch import read_csv, read_jsonl, write_table
from .jdbc import read_jdbc_table, write_jdbc_append
from .kafka import read_kafka_batch, write_kafka_batch

__all__ = [
    "read_csv",
    "read_jsonl",
    "write_table",
    "read_jdbc_table",
    "write_jdbc_append",
    "read_kafka_batch",
    "write_kafka_batch",
]
