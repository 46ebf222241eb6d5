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


def adaptive_salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    n_salts: int = 8,
    probe_top: int = 10,
    min_share_ppm: int = 50_000,
    how: str = "inner",
) -> DataFrame:
    """:func:`top_keys` wired to :func:`salted_join`: probe the left
    side's hot keys first, then salt ONLY those — the adaptive middle
    ground between a blanket ×``n_salts`` right-side blow-up and an
    unsalted join that serializes the hot key into one task.

    The probe is one TakeOrdered job over the left side plus a count
    (both driver-bounded: ``probe_top`` rows + one scalar); keys holding
    ≥ ``min_share_ppm`` parts-per-million of the left rows are salted,
    everything else joins with the constant salt 0, so the right side
    is replicated only for the (few) hot keys.  Join RESULT is
    identical to the plain join (salt columns never leave), same
    ``inner``/``left`` contract as :func:`salted_join`.  If the probe
    finds no hot key, the plain join is returned untouched — zero
    overhead on balanced data.

    At 100 TB: the probe scans one column set with map-side combine +
    TakeOrdered (no full shuffle of payloads); production deployments
    would persist the hot-key list per ingest batch instead of probing
    per query, or lean on AQE skew-join where a sort-merge plan allows.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"adaptive_salted_join supports inner/left, got: {how}")
    on = list(on)
    total = left.count()
    if total == 0:
        return left.join(right, on, how)
    hot_rows = top_keys(left, on, n=probe_top).collect()
    hot = [
        tuple(r[k] for k in on)
        for r in hot_rows
        if r["n_rows"] * 1_000_000 >= min_share_ppm * total
    ]
    if not hot:
        return left.join(right, on, how)
    key_struct = F.struct(*[F.col(k) for k in on])
    hot_lit = F.array(
        *[
            F.struct(*[F.lit(v).alias(k) for k, v in zip(on, key)])
            for key in hot
        ]
    )
    is_hot = F.array_contains(hot_lit, key_struct)
    l2 = left.withColumn(
        "__salt",
        F.when(
            is_hot,
            F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
        ).otherwise(F.lit(0)),
    )
    r2 = right.withColumn(
        "__salt",
        F.explode(
            F.when(
                is_hot, F.sequence(F.lit(0), F.lit(n_salts - 1))
            ).otherwise(F.array(F.lit(0)))
        ),
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


# ---------------------------------------------------------------------------
# Bloom-filter join prefilter
# ---------------------------------------------------------------------------

#: Bloom geometry defaults: m bits, k salted-md5 hash functions.  With
#: n build keys the FP rate is (1 - e^{-kn/m})^k; 4096/3 keeps it ≈ 1%%
#: for n ≈ 500.  Production sizing scales m with n (m ≈ 10n → ~1%%).
BLOOM_M = 4096
BLOOM_K = 3


def _bloom_bits(col: Column, *, m: int, k: int) -> Column:
    """Array of the value's ``k`` salted-md5 bit positions in [0, m) —
    oracle twin per position ``i``:
    ``CAST('0x' || substr(md5('bloom{i}:' || v), 1, 15) AS BIGINT) % m``."""
    return F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"bloom{i}:"), col)), 1, 15
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(m),
            )
            for i in range(k)
        ]
    )


def bloom_prefilter(
    probe: DataFrame,
    build: DataFrame,
    *,
    probe_col: str,
    build_col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Annotate every probe row with a Bloom-filter membership verdict for
    its ``probe_col`` value against the ``build_col`` value set — the
    cheap first pass in front of an expensive exact join (decontamination
    against a benchmark set, dedup against a published corpus, CDC key
    pruning).

    Output: probe rows + ``bloom_pass`` (boolean).  ``bloom_pass`` is
    guaranteed true for every true member (no false negatives); false
    positives occur at the geometry's FP rate and are eliminated by the
    exact join that follows — which now runs over ~FP·|probe| rows
    instead of |probe|.

    Determinism/oracle: bit positions are salted-md5 (house idiom), the
    filter is a RELATION of ≤ ``m`` distinct set bits — engine-neutral,
    no opaque bitmap state, so a DuckDB twin rebuilds it exactly.

    Scale shape: the build-side reduction is a distinct over ≤ m values
    (map-side combinable, bounded state — the sketch property); the ≤ m
    row bit relation is **broadcast**; the probe pass is a per-row HOF
    over the broadcast set — no shuffle of the probe side at all.  The
    bit-set fits any executor at any build cardinality (m is fixed);
    compare ``write_bucketed`` for the co-location alternative when the
    exact join itself is the target.
    """
    bits = (
        build.select(
            F.explode(_bloom_bits(F.col(build_col), m=m, k=k)).alias("bit")
        )
        .distinct()
        .agg(F.array_sort(F.collect_list("bit")).alias("__bits"))
    )
    probed = probe.crossJoin(F.broadcast(bits))
    has_all = F.forall(
        _bloom_bits(F.col(probe_col), m=m, k=k),
        lambda b: F.array_contains(F.col("__bits"), b),
    )
    # A NULL probe value makes the bit array NULL and has_all NULL; a
    # NULL key can never be a true member of the build set, so coalesce
    # to false — otherwise downstream `WHERE bloom_pass` silently drops
    # NULL-key rows and the audit's sums stop reconciling with n_probe.
    has_all = F.coalesce(has_all, F.lit(False))
    return probed.withColumn("bloom_pass", has_all).drop("__bits")


def bloom_prefilter_audit(
    probe: DataFrame,
    build: DataFrame,
    *,
    probe_col: str,
    build_col: str,
    group_cols: Sequence[str] = (),
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Per-group audit of the prefilter: probe count, bloom-pass count,
    exact-member count, and false positives — the numbers that justify
    (or veto) fronting the exact join with the filter.  The exact side is
    a left-semi-style broadcast membership on DISTINCT build keys.

    Output: ``*group_cols, n_probe, n_bloom_pass, n_exact, n_false_pos``.
    """
    gcols = list(group_cols)
    flagged = bloom_prefilter(
        probe, build, probe_col=probe_col, build_col=build_col, m=m, k=k
    )
    keys = build.select(F.col(build_col).alias("__bk")).distinct()
    flagged = flagged.join(
        F.broadcast(keys), flagged[probe_col] == F.col("__bk"), "left"
    ).withColumn("__exact", F.col("__bk").isNotNull())
    return flagged.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum(F.col("bloom_pass").cast("long")).alias("n_bloom_pass"),
        F.sum(F.col("__exact").cast("long")).alias("n_exact"),
        F.sum((F.col("bloom_pass") & ~F.col("__exact")).cast("long")).alias(
            "n_false_pos"
        ),
    )


def group_skew_report(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """One-row group-size distribution audit for a grouped-map pipeline:
    ``n_groups, total_rows, p50_size, p99_size, max_size,
    max_share_ppm`` over ``df.groupBy(keys)``.

    This is the observability for the ONE remaining straggler risk in
    ``sorted_group_map`` (SURVEY §7 hard-item 3): a whole-group kernel
    cannot be salted — the largest group bounds the slowest task, so the
    number that matters at 100 TB is ``max_share_ppm`` (the largest
    group's share of all rows, parts-per-million).  A healthy trainer
    input keeps it near ``10^6 / n_groups``; a hot key shows up here
    LONG before it shows up as a wedged executor.

    Determinism/scale: group sizes reduce to a DISTINCT-size histogram
    first (``(size, count)`` — bounded by the max group size, never by
    the group count), so the quantiles are exact integer order
    statistics — ``p_q = min size with cum_count ≥ ceil(q·G)`` — and the
    single-partition window only ever sees the tiny histogram.  Totals
    ride unbounded windows over that same frame (never a re-aggregation
    of the un-persisted sizes subtree — the r8 psi_report defect class).
    All outputs are exact integers; ppm uses integer division
    (nonnegative, so Spark ``div`` == DuckDB ``//``).
    """
    from pyspark.sql import Window

    sizes = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    dist = sizes.groupBy("n").agg(F.count(F.lit(1)).alias("c"))
    w_all = Window.partitionBy()
    w_cum = Window.partitionBy().orderBy("n").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = (
        dist.withColumn("cum", F.sum("c").over(w_cum))
        .withColumn("n_groups", F.sum("c").over(w_all))
        .withColumn("total_rows", F.sum(F.col("n") * F.col("c")).over(w_all))
        .withColumn("max_n", F.max("n").over(w_all))
    )
    return cum.agg(
        F.max("n_groups").alias("n_groups"),
        F.max("total_rows").alias("total_rows"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n_groups + 1) div 2"), F.col("n"))
        ).alias("p50_size"),
        F.min(
            F.when(
                F.col("cum") >= F.expr("(99 * n_groups + 99) div 100"),
                F.col("n"),
            )
        ).alias("p99_size"),
        F.max("max_n").alias("max_size"),
        F.expr("max(max_n) * 1000000L div max(total_rows)").alias(
            "max_share_ppm"
        ),
    )
