"""Exact n-gram Jaccard near-duplicate pairs via an inverted-index join.

The textbook exact algorithm, expressed relationally so Catalyst
distributes it:

1. shingle: word n-grams per doc (higher-order functions, no Python)
2. invert: explode to (shingle, doc) — the inverted index
3. candidate pairs: self-join the index on shingle (docs sharing ≥1
   shingle), counting shared shingles per pair in the same aggregation
4. score: ``|A∩B| / (|A| + |B| - |A∩B|)``, filter by threshold

Performance notes (measured, see git history):

- The shingling pipeline is **staged across projections** — norm, then
  tokens, then shingles as separate selects.  A single nested expression
  re-evaluates the whole regex+split subtree once *per lambda
  invocation* (Spark skips common-subexpression elimination inside
  higher-order functions), turning an O(len) tokenize into O(len²).
  With staging, each stage's input is a plain attribute — evaluated once
  per row, and ``CollapseProject`` keeps multi-referenced non-cheap
  expressions in their own projection.
- The inverted index feeds three consumers (sizes + both join sides);
  ``persist_index`` caches it instead of recomputing the shingle
  pipeline three times.  In a persistent pipeline you'd materialize the
  index as a table — same idea, durable.

Scale notes: the index self-join is the quadratic-risk step — a shingle
occurring in ``d`` docs contributes ``d²`` join rows.  ``max_df`` drops
ultra-frequent "stop shingles" (they carry no dedup signal and cause the
blow-up).  For corpora where even that is too hot, ``minhash.py`` is the
sub-quadratic path with the same output contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import normalized_text, tokens


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text as a single Column
    (empty array when there are fewer than ``n`` tokens).

    Column-expression form for one-shot use; the staged
    :func:`shingle_sets` is the fast path when the result feeds joins.
    """
    toks = tokens(normalized_text(text))
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        )
    )


def shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", *, n: int = 3
) -> DataFrame:
    """``doc, sh`` — distinct shingle array per doc, staged projection per
    pipeline step (see module docstring).

    Docs with fewer than ``n`` tokens yield an empty array — deliberately
    NOT filtered here: a ``size(sh) > 0`` filter gets pushed below the
    staged projections and Catalyst re-inlines the whole shingle pipeline
    into the filter condition (measured 3× slowdown).  Downstream,
    ``explode`` drops empty arrays and empty-set docs can never become
    candidates, so the filter is redundant anyway."""
    normed = df.select(
        F.col(id_col).alias("doc"), normalized_text(F.col(text_col)).alias("__norm")
    )
    tokked = normed.select("doc", tokens(F.col("__norm")).alias("__toks"))
    k = F.size("__toks") - (n - 1)
    shingled = tokked.select(
        "doc",
        F.when(k <= 0, F.array().cast("array<string>"))
        .otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), k),
                    lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i, n)),
                )
            )
        )
        .alias("sh"),
    )
    return shingled


def shingle_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", *, n: int = 3
) -> DataFrame:
    """``doc, s`` — the exploded inverted index."""
    return shingle_sets(df, text_col, id_col, n=n).select(
        "doc", F.explode("sh").alias("s")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    persist_index: bool = True,
) -> DataFrame:
    """All doc pairs (``id_a < id_b``) with n-gram Jaccard ≥ threshold.

    Columns: ``id_a, id_b, n_common, size_a, size_b, jaccard`` (rounded
    to 6 digits).  ``max_df``: ignore shingles appearing in more than
    this many docs (both in the index **and** in set sizes, keeping the
    score a true Jaccard over the filtered shingle space).
    """
    sh = shingle_index(df, text_col, id_col, n=n)
    if max_df is not None:
        keep = sh.groupBy("s").count().filter(F.col("count") <= max_df).select("s")
        sh = sh.join(keep, "s")  # broadcast by Catalyst when small
    if persist_index:
        sh = sh.persist()
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("sz").alias("size_b"))
    jac = F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "size_a", "size_b", "jaccard")
    )
