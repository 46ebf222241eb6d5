"""Exact n-gram Jaccard near-duplicate pairs via an inverted-index join.

The textbook exact algorithm, expressed relationally so Catalyst
distributes it:

1. shingle: word n-grams per doc (higher-order functions, no Python)
2. invert: explode to (shingle, doc) — the inverted index
3. candidate pairs: PREFIX-FILTERED self-join — each doc's shingles are
   sorted by ascending document frequency and only the first
   ``|x| - ceil(τ·|x|) + 1`` participate in the join (the AllPairs /
   PPJoin prefix lemma guarantees no τ-similar pair is missed)
4. score: exact rescore of candidates via ``array_intersect``;
   ``|A∩B| / (|A| + |B| - |A∩B|)``, filter by threshold

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
    if persist_index:
        # the exploded index fans out to the stop-shingle filter, the
        # document-frequency counts, AND the set build — without the
        # persist the regex+HOF shingling pipeline (the single most
        # expensive stage) re-executes per consumer (measured 2× cost
        # at sf0.1)
        sh = sh.persist()
    if max_df is not None:
        keep = sh.groupBy("s").count().filter(F.col("count") <= max_df).select("s")
        sh = sh.join(keep, "s")  # broadcast by Catalyst when small
    # PREFIX FILTER (Bayardo et al. "Scaling Up All Pairs", Xiao et al.
    # PPJoin): under any shared global ordering of shingles, two sets
    # with Jaccard ≥ τ must collide within their first
    # |x| - ceil(τ·|x|) + 1 elements.  Ordering by ascending document
    # frequency puts the RAREST shingles in the prefix, so the candidate
    # join runs over the small end of the df distribution — the index
    # self-join shrinks from Σ df² over all shingles to Σ df² over
    # prefix shingles, and every candidate is exactly rescored, so the
    # output is identical to the naive full-index join.
    counts = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_s"))
    sets = (
        sh.join(counts, "s")
        .groupBy("doc")
        .agg(F.array_sort(F.collect_list(F.struct("df_s", "s"))).alias("__arr"))
        .select(
            "doc",
            F.transform("__arr", lambda x: x["s"]).alias("sh_arr"),
            F.size("__arr").alias("sz"),
        )
    )
    if persist_index:
        # the set frame feeds three consumers: the prefix index and both
        # rescore sides
        sets = sets.persist()
    # the epsilon guards against ceil(τ·sz) landing one unit high from
    # float noise (e.g. 0.3*10 → 3.0000000000000004) and shortening the
    # prefix below the lemma's bound; erring long only adds candidates
    p = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz") - F.lit(1e-9)).cast(
        "int"
    ) + F.lit(1)
    prefix = sets.select("doc", F.explode(F.slice("sh_arr", F.lit(1), p)).alias("s"))
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )
    sa = sets.select(
        F.col("doc").alias("id_a"), F.col("sh_arr").alias("arr_a"), F.col("sz").alias("size_a")
    )
    sb = sets.select(
        F.col("doc").alias("id_b"), F.col("sh_arr").alias("arr_b"), F.col("sz").alias("size_b")
    )
    n_common = F.size(F.array_intersect("arr_a", "arr_b"))
    jac = F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_common", n_common)
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "size_a", "size_b", "jaccard")
    )
