"""Distributed BPE vocabulary induction (Sennrich et al. 2016) — the
tokenizer-training side of a training-data pipeline.

The classic algorithm alternates two very differently-sized stages, and
the distribution strategy follows that split:

- **corpus-scale** (Σ doc_len rows): token frequency counting — one
  exploded groupBy with map-side partial aggregation.  This is the only
  stage that touches the corpus, and it runs exactly once.
- **vocab-scale** (distinct tokens, ~10^5-10^6 rows regardless of corpus
  size): everything else.  Pair counting and merge application operate
  on the distinct-token table weighted by frequency, so 100 TB of text
  and 100 GB of text do the same amount of per-iteration work.

Pair counting and merge application are pure JVM higher-order functions
(transform / aggregate folds over the symbol arrays) — no Python in any
hot path.  Each merge round needs the single best pair on the driver
(a 1-row ``collect`` anchor, catalog-grade) before the next fold can be
built; that is inherent to BPE's sequential-greedy definition, not a
distribution artifact.

``bpe_pair_counts`` (one round, from-characters) is fully
SQL-expressible and carries a DuckDB oracle (``q_bpe_pairs``); the
iterative ``bpe_train`` is greedy-sequential and is differentially
tested against a pure-python BPE reference in pytest instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import normalized_text, tokens

#: End-of-word marker appended to every token's symbol sequence so
#: word-final merges are distinguishable (standard BPE convention).
EOW = "</w>"


def token_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``token, weight`` — corpus-wide whitespace-token frequencies.
    The one corpus-scale stage; everything downstream is vocab-scale."""
    toks = df.select(
        F.explode(tokens(normalized_text(F.col(text_col)))).alias("token")
    )
    return toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("weight"))


def initial_symbols(tok: Column) -> Column:
    """Character-level segmentation of a token plus the end-of-word
    marker: ``"the"`` → ``["t","h","e","</w>"]``."""
    # split on the empty pattern keeps a trailing "" (Java split semantics
    # with limit -1); tokens are non-empty and single chars never are, so
    # array_remove is exact
    return F.concat(
        F.array_remove(F.split(tok, ""), ""), F.array(F.lit(EOW))
    )


def symbol_pairs(syms: Column) -> Column:
    """Adjacent symbol pairs of a segmentation as ``"a b"`` strings.
    Fully-merged single-symbol tokens yield an empty array (Spark's
    ``sequence(1, 0)`` DESCENDS rather than being empty, so the
    short-array case needs the explicit guard)."""
    return F.when(F.size(syms) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(syms, i), F.element_at(syms, i + 1)
            ),
        )
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", *, top_k: int = 20
) -> DataFrame:
    """One BPE round from the character level: the ``top_k`` adjacent
    symbol pairs by frequency-weighted count.

    Output ``pair, merge_count`` with deterministic tie-break (count
    desc, pair asc); the top-k compiles to TakeOrderedAndProject — no
    global sort, no window over the pair table.
    """
    tf = token_frequencies(df, text_col)
    vocab = tf.select("weight", initial_symbols(F.col("token")).alias("s"))
    pairs = vocab.select(
        "weight", F.explode(symbol_pairs(F.col("s"))).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(
        F.sum("weight").cast("long").alias("merge_count")
    )
    return counts.orderBy(
        F.col("merge_count").desc(), F.col("pair").asc()
    ).limit(top_k)


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right application of the merge (a, b) → ab to a
    symbol array, as a single JVM ``aggregate`` fold: append each symbol
    unless the accumulator ends in ``a`` and the symbol is ``b``, in
    which case replace the tail with the merged symbol.  Left-to-right
    matches the reference BPE semantics (after "aa"+"a"→... the earlier
    pair wins)."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_apply(syms: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply an ordered merge list to a symbol array — ``n_merges``
    chained :func:`_apply_merge` folds, all JVM expression work.

    Expression-depth caveat: each fold nests a lambda inside the
    previous one, and Catalyst's analyzer resolves roughly one nesting
    layer per fixpoint iteration — beyond ~100 chained folds a SINGLE
    column expression fails resolution ("Max iterations reached for
    batch Resolution").  Callers applying long merge lists must chunk
    across projections; :func:`bpe_encode` does (``BPE_FOLD_CHUNK``)."""
    for a, b in merges:
        syms = _apply_merge(syms, a, b)
    return syms


#: Folds per projection when applying a long merge list: keeps every
#: single column expression ~32 lambdas deep (analyzer-safe headroom
#: under the ~100-iteration resolution budget) while the chain of
#: projections carries the full list — vocab-scale work either way.
BPE_FOLD_CHUNK = 32


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode a corpus with a TRAINED merge list — the apply side of the
    tokenizer (`bpe_train` without this is half a tokenizer).

    Output: ``id_col, token, pieces`` — one row per (doc, token
    occurrence) with the token's subword segmentation under ``merges``.

    Scale shape: merges are applied ONCE PER DISTINCT TOKEN (vocab-scale
    — ~10^5-10^6 rows regardless of corpus size), then the encoded
    vocabulary joins back to the corpus token stream on the token string
    — the same corpus-scale/vocab-scale split as training, so a 30k-merge
    production list costs O(vocab·merges) fold work, never
    O(corpus·merges).  The merge list itself is driver-held and
    broadcastable by construction (vocab-scale).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(tokens(normalized_text(F.col(text_col)))).alias("token"),
    )
    # merge application chunked across projections (BPE_FOLD_CHUNK folds
    # per Project): a 10k-merge production list is ~300 shallow Projects
    # over the VOCAB frame, not one analyzer-breaking 10k-deep lambda —
    # measured: 256 merges encode the sf0.01 corpus in ~7 s where the
    # single-expression form fails analysis outright past ~100
    vocab = (
        toks.select("token")
        .distinct()
        .select("token", initial_symbols(F.col("token")).alias("pieces"))
    )
    for i in range(0, len(merges), BPE_FOLD_CHUNK):
        vocab = vocab.select(
            "token",
            bpe_apply(F.col("pieces"), merges[i : i + BPE_FOLD_CHUNK]).alias(
                "pieces"
            ),
        )
    return toks.join(vocab, "token").select(id_col, "token", "pieces")


def bpe_train(
    df: DataFrame, text_col: str = "text", *, n_merges: int = 10
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges; returns the ordered merge list and
    the final ``token, weight, symbols`` segmentation table.

    Each round: pair-count the current vocab-scale segmentation, collect
    the single argmax pair (1-row anchor; ties broken by pair string so
    the result is engine- and partitioning-independent), and rebuild the
    segmentation with one more fold.  ``localCheckpoint`` truncates the
    per-round lineage the same way the connected-components loop does —
    without it round N replays all N-1 previous folds.  The checkpoints
    are LAZY: each round's materialization rides the next round's argmax
    ``collect`` (one driver action per round, not two — the same trick
    as the connected-components burst loop).

    Training runs ``n_merges`` driver-synced jobs DURING the call, so
    the result is memoized on (corpus plan + file digest, text_col,
    n_merges) — a tokenizer is trained once and applied many times;
    a repeat call returns the stored merge list + checkpointed
    segmentation instead of replaying every round
    (:func:`cache.value_memo`)."""
    from ...cache import _plan_key, derived_key, value_memo

    dkey = _plan_key(df)
    memo_key = (
        derived_key(dkey, "bpe.train", text_col, n_merges)
        if dkey is not None
        else None
    )
    return value_memo(
        memo_key,
        lambda: _bpe_train_impl(df, text_col, n_merges=n_merges),
        session=df.sparkSession,
    )


def _bpe_train_impl(
    df: DataFrame, text_col: str = "text", *, n_merges: int = 10
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Uncached body of :func:`bpe_train`."""
    tf = token_frequencies(df, text_col)
    vocab = tf.select(
        "token", "weight", initial_symbols(F.col("token")).alias("s")
    ).localCheckpoint(eager=False)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            vocab.select("weight", F.explode(symbol_pairs(F.col("s"))).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("weight").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["pair"].split(" ", 1)
        merges.append((a, b))
        vocab = vocab.withColumn("s", _apply_merge(F.col("s"), a, b)).localCheckpoint(
            eager=False
        )
    return merges, vocab.select("token", "weight", F.col("s").alias("symbols"))
