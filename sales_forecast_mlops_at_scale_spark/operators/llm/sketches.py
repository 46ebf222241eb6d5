"""Deterministic cardinality sketches.

KMV (k minimum values / bottom-k, Bar-Yossef et al. 2002) estimates the
number of distinct values from the k-th smallest hash: if distinct
values hash uniformly into [0, 2^60), the k-th smallest hash ``h_k``
sits near ``k/n`` of the range, so ``n ≈ (k-1) · 2^60 / h_k`` (the
unbiased form).  Groups with fewer than ``k`` distinct hashes report the
exact count.

Why not HyperLogLog?  Spark's ``approx_count_distinct`` IS the
production path at 100 TB — but its HLL++ register layout is
engine-specific, so its estimates cannot be differentially verified
against another engine.  KMV with an md5-derived hash gives the same
sketch-shaped plan (hash, keep a bounded summary per group, estimate)
while staying bit-reproducible anywhere md5 exists — the oracle twin
recomputes the identical estimate, digit for digit.

Scale shape: the distinct-hash reduction is a groupBy (map-side partial
aggregation); the k-th-smallest extraction is a per-group window over
DISTINCT hashes only (ties impossible — md5 collisions aside, and those
would only perturb the estimate, not break it).  For groups whose
distinct cardinality itself is huge, swap the window for a per-partition
bottom-k partial aggregate (same answer, bounded memory per task) — the
relational form here keeps the oracle twin line-for-line.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Hash range: first 15 hex digits of md5 → uniform in [0, 2^60).
KMV_RANGE = 1 << 60


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    *,
    k: int = 64,
    ndigits: int = 4,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: ``*group_cols, n_seen_distinct, estimate`` where
    ``n_seen_distinct`` is the number of distinct hashes observed (the
    exact answer when it is < ``k``) and ``estimate`` the KMV estimate
    rounded to ``ndigits``.
    """
    gcols = list(group_cols)
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    dh = (
        df.select(*gcols, h.alias("h"))
        .groupBy(*gcols, "h")
        .agg(F.count(F.lit(1)).alias("__n"))
        .drop("__n")
    )
    w = Window.partitionBy(*gcols).orderBy(F.col("h").asc())
    ranked = dh.withColumn("rn", F.row_number().over(w))
    agg = ranked.groupBy(*gcols).agg(
        F.max("rn").alias("n_seen_distinct"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("__hk"),
    )
    est = F.when(
        F.col("n_seen_distinct") < k, F.col("n_seen_distinct").cast("double")
    ).otherwise((F.lit(k - 1) * F.lit(float(KMV_RANGE))) / F.col("__hk"))
    return agg.select(
        *gcols,
        "n_seen_distinct",
        F.round(est, ndigits).alias("estimate"),
    )
