"""Concrete query plans + DuckDB oracle SQL.

Each registry maps ``name -> QueryDef(fn, oracle)`` where ``fn(spark,
sf_dir) -> DataFrame`` is the Spark-native implementation and ``oracle`` is
semantically-equivalent ANSI SQL for DuckDB over the same parquet fixtures
(``None`` for ops that SQL cannot express — the driver then records a
rows-only check).

Column names are aliased identically on both sides: the differential
harness sorts columns by name before value-hashing, so names are part of
the contract.  Floating-point aggregates are rounded **inside both
queries** (4-6 digits) so hashes are insensitive to summation order.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


def all_queries() -> dict[str, QueryDef]:
    from . import analytics_queries, llm_queries, ml_queries, star_queries, tpch_queries

    out: dict[str, QueryDef] = {}
    for mod in (star_queries, tpch_queries, llm_queries, ml_queries, analytics_queries):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
