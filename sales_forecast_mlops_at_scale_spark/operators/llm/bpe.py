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


#: Candidate pairs collected per training round.  A bigger window lets
#: the driver accept a longer provably-safe merge prefix per round (the
#: whole point of batching); the collect is still K rows, not the pair
#: table.
BPE_BATCH_K = 64


def _safe_merge_prefix(
    rows: list, k: int, budget: int
) -> list[tuple[str, str]]:
    """The longest prefix of the ranked candidate pairs that provably
    equals running sequential Sennrich rounds, decided entirely from the
    collected top-``k`` counts.

    ``rows`` are ``(pair, cnt, merged_exists)`` in (cnt desc, pair asc)
    order.  Accepting a prefix is exact because, at sequential step
    ``i``, every pair ranked before ``p_i`` has already been merged away
    (prefix property), pairs DISJOINT from the accepted merges keep
    their counts and order, and the only candidates that could newly
    beat ``p_i`` are pairs whose counts CHANGED — all of which touch an
    accepted merge's symbols.  Three stop conditions make those
    impossible:

    - **overlap stop**: the next pair shares a symbol with an accepted
      merge — its own count may have changed, so its rank is stale.
    - **collision stop** (``merged_exists``): an accepted merge's
      concatenation is ALREADY a live symbol, so existing pairs
      containing that symbol can gain occurrences (e.g. fixture word
      "aa" after merging ("a","a")) — no later rank is trustworthy;
      the colliding merge itself is still safe to take (it IS the
      sequential argmax at its step).
    - **strict-bound stop**: new pairs created by an accepted merge
      ``(a,b)→ab`` have counts bounded by the OLD counts of pairs
      adjacent to ``a``/``b``; those sharing pairs all rank after the
      candidate (else the overlap stop fired earlier), but on a TIE the
      new pair's string could win the tie-break, so the candidate must
      be STRICTLY above every visible sharing pair and above the
      ``k``-th count (the ceiling on pairs outside the window).
    """
    seen_all = len(rows) < k
    ck = 0 if seen_all else rows[-1]["cnt"]
    accepted: list[tuple[str, str]] = []
    used: set[str] = set()
    accepted_pairs: set[str] = set()
    for i, r in enumerate(rows):
        a, b = r["pair"].split(" ", 1)
        if i > 0:
            bound = None if seen_all else ck
            for r2 in rows:
                if r2["pair"] in accepted_pairs or r2 is r:
                    continue
                m2 = set(r2["pair"].split(" ", 1))
                if m2 & used:
                    bound = max(bound or 0, r2["cnt"])
            if bound is not None and r["cnt"] <= bound:
                break
            if {a, b} & used:
                break
        # intra-batch collision: two accepted merges can mint the SAME
        # concatenation (('a','bc') then ('ab','c') both produce 'abc')
        # without tripping merged_exists (which only sees PRE-batch
        # symbols) or the overlap stop (which checks {a,b}, not a+b).
        # After such a double mint a pair containing the shared symbol
        # can reach the SUM of two old adjacent counts while the
        # strict-bound stop only bounds by the MAX — so, exactly like
        # the collision stop, accept this candidate (it is still the
        # sequential argmax at its step) but end the batch here.
        intra_collision = (a + b) in used
        accepted.append((a, b))
        accepted_pairs.add(r["pair"])
        used |= {a, b, a + b}
        if r["merged_exists"] or intra_collision or len(accepted) >= budget:
            break
    return accepted


def bpe_train_local(
    df: DataFrame, text_col: str = "text", *, n_merges: int = 10
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Sennrich BPE with the iteration on the DRIVER: one distributed
    job total, regardless of ``n_merges``.

    The scale analysis in the module docstring is what makes this
    legitimate: after :func:`token_frequencies` (the only corpus-scale
    stage, distributed, map-side combined) the state is VOCAB-scale —
    ~10^5-10^6 ``(token, weight)`` rows at any corpus size, i.e. tens of
    MB on the driver.  This is exactly how production tokenizer trainers
    (subword-nmt, HuggingFace tokenizers) operate: aggregate word counts
    at corpus scale, then iterate locally.  The local loop is the
    textbook incremental algorithm — a pair→tokens inverted index finds
    the affected tokens per merge, their old pair counts are subtracted
    and new ones added by RE-SEGMENTING just those tokens (delta-exact
    by construction, no trigram greedy-run edge cases), and the argmax
    comes from a lazy-deletion heap — O(affected work · log) per merge,
    so a 50k-merge train issues ZERO additional Spark actions where
    :func:`bpe_train` would issue O(n_merges / batch) rounds.

    Output contract and results are IDENTICAL to :func:`bpe_train`
    (property-tested); use this one when ``n_merges`` is large, the
    distributed loop when driver memory for the vocabulary is the
    binding constraint.  Memoized like :func:`bpe_train`.
    """
    from ...cache import _plan_key, derived_key, value_memo

    dkey = _plan_key(df)
    memo_key = (
        derived_key(dkey, "bpe.train.local", text_col, n_merges)
        if dkey is not None
        else None
    )
    return value_memo(
        memo_key,
        lambda: _bpe_train_local_impl(df, text_col, n_merges=n_merges),
        session=df.sparkSession,
    )


def _greedy_apply(syms: tuple, a: str, b: str) -> tuple:
    """Driver-side twin of :func:`_apply_merge` (greedy left-to-right)."""
    out: list[str] = []
    ab = a + b
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = ab
        else:
            out.append(x)
    return tuple(out)


def _bpe_train_local_impl(
    df: DataFrame, text_col: str, *, n_merges: int
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Uncached body of :func:`bpe_train_local`."""
    import heapq
    from collections import Counter, defaultdict

    rows = token_frequencies(df, text_col).collect()  # vocab-scale
    weights = {r["token"]: r["weight"] for r in rows}
    segs = {tok: tuple(tok) + (EOW,) for tok in weights}

    pair_counts: Counter = Counter()
    index: defaultdict = defaultdict(set)  # pair -> tokens (may go stale)
    for tok, syms in segs.items():
        w = weights[tok]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += w
            index[p].add(tok)
    # heap entries are (-count, "a b", pair); stale entries (count has
    # moved on) are discarded on pop by comparing against pair_counts
    heap = [(-c, f"{p[0]} {p[1]}", p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, _, best = heapq.heappop(heap)
        cur = pair_counts.get(best, 0)
        if cur <= 0:
            continue
        if -negc != cur:  # stale: re-queue at the live count
            heapq.heappush(heap, (-cur, f"{best[0]} {best[1]}", best))
            continue
        a, b = best
        merges.append((a, b))
        for tok in list(index.get(best, ())):
            syms = segs[tok]
            if best not in zip(syms, syms[1:]):  # stale index entry
                index[best].discard(tok)
                continue
            w = weights[tok]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= w
            new = _greedy_apply(syms, a, b)
            segs[tok] = new
            for p in zip(new, new[1:]):
                c = pair_counts[p] + w
                pair_counts[p] = c
                index[p].add(tok)
                heapq.heappush(heap, (-c, f"{p[0]} {p[1]}", p))
        pair_counts.pop(best, None)
        index.pop(best, None)

    spark = df.sparkSession
    seg_df = spark.createDataFrame(
        [(tok, weights[tok], list(syms)) for tok, syms in segs.items()],
        "token string, weight long, symbols array<string>",
    )
    return merges, seg_df


def _bpe_train_impl(
    df: DataFrame, text_col: str = "text", *, n_merges: int = 10
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Uncached body of :func:`bpe_train`.

    Each round collects the top-``BPE_BATCH_K`` candidate pairs (plus a
    flag marking merge-string collisions with live symbols) in ONE
    driver action and accepts the longest provably-sequential-equal
    prefix (:func:`_safe_merge_prefix`) — O(n_merges / batch) driver
    rounds instead of one round per merge, with results identical to
    the one-at-a-time loop (property-tested against the pure-Python
    reference in ``tests/test_properties.py``)."""
    tf = token_frequencies(df, text_col)
    vocab = tf.select(
        "token", "weight", initial_symbols(F.col("token")).alias("s")
    ).localCheckpoint(eager=False)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        k = BPE_BATCH_K
        pairs = (
            vocab.select(
                "weight", F.explode(symbol_pairs(F.col("s"))).alias("pair")
            )
            .groupBy("pair")
            .agg(F.sum("weight").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(k)
        )
        syms = (
            vocab.select(F.explode(F.col("s")).alias("sym")).distinct()
        )
        top = pairs.join(
            syms,
            F.replace(F.col("pair"), F.lit(" "), F.lit("")) == F.col("sym"),
            "left",
        ).select(
            "pair", "cnt", F.col("sym").isNotNull().alias("merged_exists")
        )
        rows = sorted(
            top.collect(), key=lambda r: (-r["cnt"], r["pair"])
        )
        if not rows:
            break
        batch = _safe_merge_prefix(rows, k, n_merges - len(merges))
        merges.extend(batch)
        # chunk the folds across projections (same analyzer-depth budget
        # as bpe_encode); one lazy checkpoint per ROUND, not per merge
        for i0 in range(0, len(batch), BPE_FOLD_CHUNK):
            cur = F.col("s")
            for a, b in batch[i0 : i0 + BPE_FOLD_CHUNK]:
                cur = _apply_merge(cur, a, b)
            vocab = vocab.withColumn("s", cur)
        vocab = vocab.localCheckpoint(eager=False)
    return merges, vocab.select("token", "weight", F.col("s").alias("symbols"))
