"""Duplicate-span coverage: the exact-substring tier of the dedup cascade.

Implements the per-document signal behind exact-substring deduplication
(Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better"): how much of each document is covered by token spans that also
appear verbatim in *another* document.  The full suffix-array algorithm
is inherently sequential; the standard distributed approximation — used
here — slides a fixed-width token window (``n``-gram, default 8) over
every position and marks a position as duplicated when its window occurs
in at least one other document.  Span *coverage* (union of overlapping
duplicated windows, not their count) is what the filter thresholds on:
a doc that is 60% boilerplate shows 0.6 here even though every one of
its windows overlaps the next.

Relational formulation (all JVM-side, no Python):

1. positional grams: one row per (doc, pos) with the xxhash64 of the
   ``n``-token window starting at ``pos`` — positions kept, NOT
   deduplicated (coverage is positional).
2. cross-doc duplicate grams: ``GROUP BY gram HAVING min(doc) <>
   max(doc)`` — one shuffle with map-side partial min/max, no
   count-distinct state.
3. duplicated starts: semi-join of the positional rows against (2).
4. interval-union per doc ("gaps and islands"): sort the surviving
   starts per doc; each window [pos, pos+n-1] contributes
   ``max(0, (pos+n-1) - max(prev_covered_end, pos-1))`` new covered
   tokens, where ``prev_covered_end`` is the running max of earlier
   window ends.  Pure integer arithmetic — engine-exact, so the DuckDB
   oracle twin hash-matches.

Scale shape: the positional index is Σ doc_len rows (same as the
contamination scan); step 2 is one partial-aggregated shuffle on an
8-byte key; step 4's window is partitioned by doc, so per-task state is
bounded by the longest document, never the corpus.  No shingle strings
ride any shuffle — only hashes.  Hash-collision caveat as in
``jaccard.py``: a cross-doc xxhash64 collision could mark a unique span
duplicated with probability ~m²/2^65 over the corpus vocabulary; the
string-keyed oracle pins it at test scale.

Reference scope note: the reference app (sales-forecast-mlops) has no
text corpus surface; this operator belongs to the mandated
beyond-reference LLM-training-data family (SURVEY §2 "documents"
extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import normalized_text, tokens


def positional_grams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", *, n: int = 8
) -> DataFrame:
    """``doc, pos, gh`` — xxhash64 of the ``n``-token window starting at
    each 1-based token position.  Staged projections (norm → toks →
    windows) for the same CSE reason as ``jaccard.shingle_sets``."""
    normed = df.select(
        F.col(id_col).alias("doc"), normalized_text(F.col(text_col)).alias("__norm")
    )
    tokked = normed.select("doc", tokens(F.col("__norm")).alias("__toks"))
    k = F.size("__toks") - (n - 1)
    grams = tokked.select(
        "doc",
        F.when(k <= 0, F.array().cast("array<string>"))
        .otherwise(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i, n)),
            )
        )
        .alias("__grams"),
    )
    # posexplode drops empty arrays: docs shorter than n simply produce no
    # positional rows and rejoin with zero coverage at the end.
    return grams.select(
        "doc", F.posexplode("__grams").alias("pos0", "__g")
    ).select("doc", (F.col("pos0") + 1).alias("pos"), F.xxhash64("__g").alias("gh"))


def dup_span_coverage(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", *, n: int = 8
) -> DataFrame:
    """Per-document duplicate-span stats:

    ``doc_id, n_tokens, n_grams, n_dup_grams, covered_tokens,
    dup_coverage`` where ``dup_coverage`` is the fraction of the doc's
    tokens inside at least one cross-doc duplicated ``n``-gram window.
    Every input doc appears in the output (zero coverage when nothing
    matches or the doc is shorter than ``n``).
    """
    normed = df.select(
        F.col(id_col).alias("doc"), normalized_text(F.col(text_col)).alias("__norm")
    )
    base = normed.select("doc", tokens(F.col("__norm")).alias("__toks")).select(
        "doc", F.size("__toks").cast("long").alias("n_tokens")
    )

    grams = positional_grams(df, text_col, id_col, n=n)

    # Cross-doc duplicate detection without count-distinct: a gram whose
    # doc-range has min != max occurs in >= 2 distinct docs.  Partial
    # min/max combine map-side, so the shuffle carries one row per
    # distinct gram hash per map partition, not per occurrence.
    dup_grams = (
        grams.groupBy("gh")
        .agg(F.min("doc").alias("__mn"), F.max("doc").alias("__mx"))
        .filter(F.col("__mn") != F.col("__mx"))
        .select("gh")
    )

    dup_starts = grams.join(dup_grams, "gh", "left_semi")

    # Gaps-and-islands union of [pos, pos+n-1] windows, integer-exact.
    w_prev = (
        Window.partitionBy("doc")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    end = F.col("pos") + F.lit(n - 1)
    prev_end = F.coalesce(F.max(end).over(w_prev), F.lit(0))
    contrib = F.greatest(F.lit(0), end - F.greatest(prev_end, F.col("pos") - 1))
    per_doc = (
        dup_starts.select("doc", contrib.alias("__new"))
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_dup_grams"),
            F.sum("__new").cast("long").alias("covered_tokens"),
        )
    )

    out = base.join(per_doc, "doc", "left")
    return out.select(
        F.col("doc").alias("doc_id"),
        "n_tokens",
        F.greatest(F.col("n_tokens") - F.lit(n - 1), F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce(F.col("n_dup_grams"), F.lit(0)).cast("long").alias("n_dup_grams"),
        F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("long").alias("covered_tokens"),
        F.round(
            F.coalesce(F.col("covered_tokens"), F.lit(0))
            / F.greatest(F.col("n_tokens"), F.lit(1)),
            6,
        ).alias("dup_coverage"),
    )
