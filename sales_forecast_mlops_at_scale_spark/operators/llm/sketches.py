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
#: Default sketch size — shared with the oracle twins in plans/llm_queries
#: so a changed k re-syncs both sides.
KMV_K = 64


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    *,
    k: int = KMV_K,
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


def kmv_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    *,
    k: int = KMV_K,
    ndigits: int = 4,
) -> DataFrame:
    """Theta-sketch-style set-operation estimates from two KMV sketches:
    distinct-union size, Jaccard similarity, and distinct-intersection
    size of the two value sets.

    Standard bottom-k set algebra (Beyer et al., "On Synopses for
    Distinct-Value Estimation Under Multiset Operations"): take the k
    smallest hashes of A ∪ B; the union estimate is KMV on that sample,
    the Jaccard estimate is the fraction of the sample present in both
    sides, and intersection ≈ jaccard × union.  Everything below the
    bottom-k extraction is exact integer work, so the oracle twin
    reproduces every digit.

    Scale shape: per-side distinct-hash reduction (map-side combinable),
    a full-outer merge on the 8-byte hash, and a global ``ORDER BY h
    LIMIT k`` — Spark executes that as TakeOrderedAndProject
    (per-partition top-k, no global sort).  Output (one row):
    ``k, union_est, jaccard_est, intersect_est``.
    """

    def hashes(df: DataFrame) -> DataFrame:
        h = F.conv(
            F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
        ).cast("long")
        return df.select(h.alias("h")).distinct()

    a = hashes(df_a).withColumn("ia", F.lit(True))
    b = hashes(df_b).withColumn("ib", F.lit(True))
    u = a.join(b, "h", "full_outer").select(
        "h",
        F.coalesce("ia", F.lit(False)).alias("ia"),
        F.coalesce("ib", F.lit(False)).alias("ib"),
    )
    bk = u.orderBy(F.col("h").asc()).limit(k)
    agg = bk.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("h").alias("hk"),
        F.sum(F.when(F.col("ia") & F.col("ib"), 1).otherwise(0)).alias("nb"),
    )
    union_est = F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
        (F.lit(float(k - 1)) * F.lit(float(KMV_RANGE))) / F.col("hk")
    )
    jac = F.col("nb") / F.col("n").cast("double")
    return agg.select(
        F.lit(k).alias("k"),
        F.round(union_est, ndigits).alias("union_est"),
        F.round(jac, 6).alias("jaccard_est"),
        F.round(jac * union_est, ndigits).alias("intersect_est"),
    )


#: Default bin count for the quantile sketch — shared with the oracle
#: twin so a changed resolution re-syncs both sides.
QSKETCH_BINS = 256


def binned_quantiles(
    df: DataFrame,
    value_col: str,
    qs: Sequence[float],
    group_cols: Sequence[str] = (),
    *,
    bins: int = QSKETCH_BINS,
    ndigits: int = 6,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Per-group quantile estimates from an equi-width histogram sketch —
    the deterministic, oracle-checkable twin of ``approx_percentile``
    (whose Greenwald-Khanna summary is engine-specific and therefore
    cannot be differentially verified), exactly as KMV is the twin of
    HyperLogLog.

    Two aggregation passes, bounded state: (1) per-group ``min/max/
    count``; (2) per-group counts over ``bins`` equi-width cells
    (map-side combinable — at most ``bins`` rows per group regardless of
    data size, where an exact percentile sorts the full column).  The
    quantile is read off the cumulative histogram with linear
    interpolation inside the hit cell: rank ``r = max(1, ceil(q·n))``,
    first bin whose cumulative count reaches ``r``, then
    ``lo + (hi−lo)/bins · (bin + (r − cum_prev)/cnt)``.  Estimation
    error is bounded by one cell width — tighten with ``bins``, the
    same knob trade as any histogram sketch.  Every arithmetic step is
    shaped identically in the SQL twin, so the estimates match digit
    for digit.

    Output: ``*group_cols, q, estimate, n_rows`` (NULL values excluded
    from ranks; a group with ``hi == lo`` reports ``lo`` at every q).

    MERGEABILITY: with data-derived bounds (the default) the sketch is
    TWO-pass — per-group ``lo/hi`` must be known before binning, so two
    sketches built over different data slices do not share a grid and
    their cell counts cannot be added.  Pass explicit ``bounds =
    (lo, hi)`` for the one-pass, fully mergeable form (the streaming /
    multi-dataset shape: fix the grid once, then cell counts from any
    partitioning of the data sum exactly — same property as the CMS
    grid).  Out-of-range values clamp into the edge cells, biasing tail
    estimates toward the given bounds, exactly like any fixed-range
    histogram.
    """
    from ...cache import persist_slot

    if bounds is not None and not bounds[0] < bounds[1]:
        raise ValueError(
            f"bounds must satisfy lo < hi, got {bounds!r}"
        )
    gcols = list(group_cols)
    v = F.col(value_col).cast("double")
    if bounds is None:
        stats = (
            df.where(v.isNotNull())
            .groupBy(*gcols)
            .agg(
                F.min(v).alias("lo"),
                F.max(v).alias("hi"),
                F.count(v).alias("n"),
            )
        )
    else:
        stats = (
            df.where(v.isNotNull())
            .groupBy(*gcols)
            .agg(F.count(v).alias("n"))
            .select(
                *gcols,
                F.lit(float(bounds[0])).alias("lo"),
                F.lit(float(bounds[1])).alias("hi"),
                "n",
            )
        )
    # the tiny per-group bounds frame feeds TWO broadcast joins (the
    # binning pass and the quantile read-off); unpersisted, Catalyst
    # evaluates the full scan+min/max aggregation once per consumer —
    # the r11 plan dump shows 3 source scans where the documented floor
    # is 2.  Persisting the ≤#groups-row frame makes both consumers read
    # one materialization (guide §2.4: shared subtree, one evaluation).
    stats = persist_slot("sketches.binned_quantiles.stats", stats)
    src = df.where(v.isNotNull()).select(*gcols, v.alias("v"))
    joined = (
        src.join(F.broadcast(stats), gcols)
        if gcols
        else src.crossJoin(F.broadcast(stats))
    )
    # greatest(0, ·) clamps below-range values into the edge cell for
    # the explicit-bounds form; with data-derived bounds v ≥ lo always,
    # so it is an exact no-op there (integer clamp — no float drift)
    bin_ = (
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(bins - 1),
                    F.floor(
                        (F.col("v") - F.col("lo"))
                        / (F.col("hi") - F.col("lo"))
                        * bins
                    ),
                ),
            )
        )
        .cast("int")
    )
    counts = (
        joined.select(*gcols, bin_.alias("bin"))
        .groupBy(*gcols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy(*gcols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("cum", F.sum("cnt").over(w))
    cum = (
        cum.join(F.broadcast(stats), gcols)
        if gcols
        else cum.crossJoin(F.broadcast(stats))
    )
    qexp = cum.select(
        "*", F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    ).withColumn(
        "r", F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("n"))).cast("long")
    )
    pick = Window.partitionBy(*gcols, "q").orderBy("bin")
    hit = (
        qexp.where(F.col("cum") >= F.col("r"))
        .withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
    )
    est = F.col("lo") + (F.col("hi") - F.col("lo")) / bins * (
        F.col("bin")
        + (F.col("r") - (F.col("cum") - F.col("cnt"))) * F.lit(1.0) / F.col("cnt")
    )
    return hit.select(
        *gcols,
        "q",
        F.round(est, ndigits).alias("estimate"),
        F.col("n").cast("long").alias("n_rows"),
    )
