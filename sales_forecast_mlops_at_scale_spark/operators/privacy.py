"""Privacy-risk auditing: k-anonymity over quasi-identifier lattices.

The governance layer (``streaming/forget.py``, ``streaming/snapshots.py``)
answers *"can we erase this subject?"*; this module answers the sibling
audit question a 100 TB warehouse faces BEFORE any release: *"does this
projection re-identify people?"*.  A row set is **k-anonymous** w.r.t. a
quasi-identifier (QI) set when every combination of QI values (every
*equivalence class*) contains at least ``k`` rows (Sweeney 2002,
"k-anonymity: a model for protecting privacy").  Rows in classes smaller
than ``k`` are re-identification risks; the standard remedy is
*generalization* — dropping or coarsening QI columns — which this module
evaluates across a whole lattice of candidate generalizations in ONE pass.

Reference parity: the reference stack stores raw per-store sales rows in
Postgres with no release-audit tooling at all (its only privacy surface is
ad-hoc SQL); this is a beyond-reference governance operator, same family
as the erasure audit (``plans/llm_queries.q_erasure_audit``).

Scale design (100 TB)
---------------------
One ``GROUPING SETS`` aggregation computes the equivalence-class sizes of
EVERY generalization level in a single scan + a single shuffle — the class
count is a plain ``count(*)``, so the map side pre-combines and only
(QI-combination, partial-count) rows ride the exchange, once per level.
The second stage reduces class rows (≤ distinct-QI cardinality, millions
at most — never data-scale) to one summary row per level, again map-side
combinable.  Nothing in the plan is proportional to raw row count except
the initial scan, and no Python touches any row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    levels: Sequence[Sequence[str]],
    *,
    ks: Sequence[int] = (2, 5, 10),
) -> DataFrame:
    """Per-generalization-level k-anonymity risk summary.

    ``levels`` is the generalization lattice to evaluate — each entry a QI
    column list, e.g. ``[["nation","segment","bal_bucket"],
    ["nation","segment"], ["nation"]]``.  Output: one row per level with

    - ``level``          — the level's columns joined with ``+``
    - ``n_classes``      — number of equivalence classes
    - ``min_class_size`` — the dataset's actual k (its k-anonymity)
    - ``rows_lt_{k}``    — rows in classes smaller than ``k`` (the
      re-identification risk surface), for each requested ``k``
    - ``risk_ppm_{k}``   — that surface as integer parts-per-million of
      the table (exact integer arithmetic — hash-stable across engines)

    All levels are computed in ONE ``GROUPING SETS`` scan; a level's
    label is reconstructed from ``grouping(col)`` flags, so levels must
    be distinct column *sets* (duplicates would merge).
    """
    levels = [list(lv) for lv in levels]
    all_cols: list[str] = []
    for lv in levels:
        for c in lv:
            if c not in all_cols:
                all_cols.append(c)
    seen: set[frozenset[str]] = set()
    for lv in levels:
        key = frozenset(lv)
        if key in seen:
            raise ValueError(f"duplicate generalization level: {sorted(key)}")
        seen.add(key)

    # one scan, one shuffle: class sizes for every level at once
    classes = (
        df.groupingSets([[F.col(c) for c in lv] for lv in levels], *all_cols)
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            *[F.grouping(c).alias(f"_g_{c}") for c in all_cols],
        )
    )
    # label each class row with its level (grouping(c)=0 ⇔ c is grouped);
    # NULL QI values are real data (they form their own class), so the
    # grouping flags — not null-ness — are what identify the level.
    label = None
    for lv in levels:
        cond = None
        for c in all_cols:
            want = F.lit(0 if c in lv else 1)
            this = F.col(f"_g_{c}") == want
            cond = this if cond is None else (cond & this)
        name = F.lit("+".join(lv))
        label = F.when(cond, name) if label is None else label.when(cond, name)
    classes = classes.withColumn("level", label)

    risk_aggs = []
    for k in ks:
        at_risk = F.when(F.col("class_size") < k, F.col("class_size")).otherwise(
            F.lit(0)
        )
        risk_aggs.append(F.sum(at_risk).alias(f"rows_lt_{k}"))
    out = classes.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("class_size").alias("min_class_size"),
        F.sum("class_size").alias("n_rows"),
        *risk_aggs,
    )
    for k in ks:
        # integer division (Spark `div` == DuckDB `//`): exact, no
        # float rounding to drift between engines
        out = out.withColumn(
            f"risk_ppm_{k}",
            F.expr(f"(rows_lt_{k} * 1000000L) div n_rows"),
        )
    return out


def l_diversity_report(
    df: DataFrame,
    qi: Sequence[str],
    sensitive: str,
    *,
    ls: Sequence[int] = (2, 3),
) -> DataFrame:
    """Distinct-l-diversity audit (Machanavajjhala et al. 2007): k-anonymity
    alone fails the *homogeneity attack* — a class of 50 identical rows is
    50-anonymous yet reveals every member's sensitive value.  A class is
    distinct-l-diverse when it contains at least ``l`` distinct sensitive
    values; this reports, for one QI level, how much of the table sits in
    classes below each requested ``l``.

    Output (one row): ``n_classes``, ``n_rows``, ``min_l`` (the table's
    actual diversity), and per requested ``l``: ``rows_lt_l{l}`` +
    ``risk_ppm_l{l}`` (exact integer ppm).

    Scale: count-distinct per class is the only shuffle-heavy step; it
    shuffles (QI, sensitive) pairs once — map-side pre-deduped by a
    partial aggregate on the composite key — then the class rows reduce
    to one summary row.  Nothing is data-scale after the first exchange.
    """
    qi = list(qi)
    classes = df.groupBy(*qi).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct(sensitive).alias("n_sensitive"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("class_size").alias("n_rows"),
        F.min("n_sensitive").alias("min_l"),
    ]
    for l in ls:
        aggs.append(
            F.sum(
                F.when(F.col("n_sensitive") < l, F.col("class_size")).otherwise(
                    F.lit(0)
                )
            ).alias(f"rows_lt_l{l}")
        )
    out = classes.agg(*aggs)
    for l in ls:
        out = out.withColumn(
            f"risk_ppm_l{l}", F.expr(f"(rows_lt_l{l} * 1000000L) div n_rows")
        )
    return out
