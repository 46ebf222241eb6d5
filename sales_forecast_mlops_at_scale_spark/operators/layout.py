"""Multi-dimensional data layout: Z-order clustering for min/max skipping.

Parquet readers skip row groups (and table formats skip whole files)
whose footer min/max statistics exclude a pushed-down predicate.  A
linear ``ORDER BY a`` layout makes those stats razor-sharp on ``a`` and
useless on every other column — each file spans the full range of ``b``.
Interleaving the bits of several columns into one **Z-value** (Morton
code) and range-partitioning + sorting on it keeps per-file min/max
ranges narrow on ALL participating columns at once, so selective filters
on any of them prune most of a 100 TB table before a byte is read.
This is the same layout trick Delta's ``OPTIMIZE ZORDER BY`` applies;
here it is plain DataFrame ops over plain parquet.

Everything is JVM-side integer bit math (``shiftright``/``shiftleft``/
``&``/``|``) inside whole-stage codegen — no UDF — and the z-value is a
deterministic pure function of its inputs, so it hash-checks against a
DuckDB oracle doing the identical bit arithmetic.

The demonstrable claim (``tests/test_layout.py``): z-ordered files have
per-file min/max spans that are a small fraction of the column range on
*both* dimensions, while a linear sort leaves the second dimension's
span at ~100% — i.e. z-order makes min/max skipping effective on
secondary columns, linear sort does not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: Sequence[Column | str], *, bits: int = 16) -> Column:
    """Morton / Z-order key: interleave the low ``bits`` bits of each
    column (least-significant first, column order = tie priority).

    Inputs must already be non-negative integer *ranks* — callers map
    domain values onto a bounded integer grid first (e.g. days since an
    epoch, bucketed amounts).  Values above ``2^bits - 1`` are clamped so
    a stray outlier cannot fold back onto the origin and corrupt the
    curve ordering.  ``len(cols) * bits`` must fit a signed BIGINT (≤ 62).
    """
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds BIGINT range")
    cap = F.lit((1 << bits) - 1)
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = F.least(F.col(c).cast("long") if isinstance(c, str) else c.cast("long"), cap)
        for i in range(bits):
            # bit i of column j lands at interleaved position i*n + j
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return out


def zvalue_sql(cols: Sequence[str], *, bits: int = 16) -> str:
    """The identical bit arithmetic as ANSI SQL (DuckDB oracle twin)."""
    n = len(cols)
    cap = (1 << bits) - 1
    terms = [
        f"((least(CAST({c} AS BIGINT), {cap}) >> {i}) & 1) << {i * n + j}"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return " | ".join(f"({t})" for t in terms)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    *,
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Cluster ``df`` along the Z-curve of ``cols`` and write parquet:
    range-partition on the z-value (equi-depth file sizes via range
    exchange sampling), sort within each file, drop the helper column.

    Each column is min/max-rescaled onto the full ``2^bits`` grid first.
    This matters: interleaving RAW values whose domains use different bit
    widths lets the wider column own every high-order z bit, collapsing
    the curve toward a linear sort on that column (measured: raw
    interleave of an 11-bit and a 12-bit domain left the narrow column's
    per-file span at ~0.75 of its range; normalized, both sit near the
    ~sqrt(1/num_files) ideal).  The rescale costs one tiny min/max agg of
    the write batch.

    At warehouse scale this is the compaction job's write path: one extra
    shuffle at write time buys min/max skipping on every subsequent read
    filtered by ANY of ``cols``."""
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
    ).first()
    top = float((1 << bits) - 1)
    scaled = []
    for c in cols:
        lo, hi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
        width = (hi - lo) or 1.0
        scaled.append(
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(width) * top).cast(
                "long"
            )
        )
    z = zvalue(scaled, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_span_stats(spark, path: str, cols: Sequence[str]) -> DataFrame:
    """Per-file min/max span of each column, as a fraction of the global
    range — the direct measure of how much a min/max-pruning reader can
    skip.  ``avg(span_frac) ≈ 1/num_files`` means near-perfect clustering
    on that column; ``≈ 1.0`` means the layout cannot prune it at all."""
    df = spark.read.parquet(path).select(
        F.input_file_name().alias("__file"), *[F.col(c).cast("double") for c in cols]
    )
    per_file = df.groupBy("__file").agg(
        *[F.min(c).alias(f"min_{c}") for c in cols],
        *[F.max(c).alias(f"max_{c}") for c in cols],
    )
    bounds = {c: df.agg(F.min(c), F.max(c)).first() for c in cols}
    spans = [
        (
            (F.col(f"max_{c}") - F.col(f"min_{c}"))
            / F.lit(float(bounds[c][1] - bounds[c][0]))
        ).alias(f"span_{c}")
        for c in cols
    ]
    return per_file.select("__file", *spans)


def compact(
    spark,
    src_path: str,
    dst_path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite ``src_path`` into ``dst_path`` with
    file sizes near ``target_file_bytes``.  Returns the file count written.

    The streaming ingest path appends a file per micro-batch per
    partition; a day of 5-minute triggers leaves thousands of KB-scale
    files whose open/seek overhead dominates scans long before data
    volume does.  Compaction is the maintenance job every parquet
    warehouse runs; here: size the output from the ACTUAL input bytes
    (Hadoop FS metadata — works on HDFS/S3A/local alike), then
    ``coalesce`` — a shuffle-free narrow repacking; use
    :func:`write_zordered` instead when the rewrite should also fix
    clustering, trading a range shuffle for min/max prunability.
    """
    import math

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = path.getFileSystem(conf)
    total = fs.getContentSummary(path).getLength()
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_path)
    df.coalesce(n).write.mode("overwrite").parquet(dst_path)
    return n
