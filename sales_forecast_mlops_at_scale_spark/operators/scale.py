"""Scale-engineering operators: skew-salted joins and bucketed layouts.

These address the two shuffle pathologies a 100 TB deployment hits that
small-SF correctness tests never show:

- **Skew**: a hash-partitioned join serializes every row of a hot key into
  one task.  AQE's skew-join splitting (``spark.sql.adaptive.skewJoin``)
  handles sort-merge joins automatically; :func:`salted_join` is the
  explicit fallback for the cases AQE cannot split (e.g. a skewed
  broadcast-ineligible side feeding a window or grouped-map next).
- **Repeated shuffles of the same fact table**: joins that always key on
  the same column can pre-pay the shuffle ONCE by writing both sides
  bucketed (:func:`write_bucketed`); Spark then plans the join with zero
  Exchange — at 100 TB this converts every downstream co-keyed join from
  a full network shuffle into a local merge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (probe, skewed) side salted across
    ``n_salts`` sub-keys and the right (build) side replicated to match.

    Each left row gets one of ``n_salts`` salt values (round-robin via
    ``monotonically_increasing_id`` — per-row arbitrary, join RESULT is
    salt-invariant); each right row is exploded to all salts.  A key with
    p% of the rows now spreads over ``n_salts`` tasks instead of one.

    Cost model: right side grows ×``n_salts`` — use when right ≪ left but
    too big (or unbroadcastable) for a broadcast join, and the left key
    distribution is hot.  Supports ``inner`` and ``left`` joins (the
    replicated right side would double-count under right/full joins).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got: {how}")
    on = list(on)
    l2 = left.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    r2 = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l2.join(r2, on + ["__salt"], how).drop("__salt")


def top_keys(df: DataFrame, keys: Sequence[str], *, n: int = 10) -> DataFrame:
    """Hot-key probe: the ``n`` most frequent key tuples with counts —
    the diagnostic feeding a decision to salt / isolate / pre-aggregate.
    TakeOrderedAndProject: no full sort, no driver scan."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc(), *keys)
        .limit(n)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: Sequence[str],
    n_buckets: int = 8,
    sort_by: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) table.

    Joins/aggregations between tables bucketed on the same keys with the
    same bucket count plan with NO Exchange — the shuffle is pre-paid at
    write time.  ``path`` makes it an external table (data outside the
    warehouse dir); bucketing metadata lives in the session catalog
    (Hive metastore / Unity in production)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *list(bucket_by))
    if sort_by:
        writer = writer.sortBy(*list(sort_by))
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)
