"""Data Selection via Importance Resampling (DSIR) — hashed-unigram
importance weights for targeted pre-training data selection (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling").

Given a small *target* corpus (the distribution you want more of — e.g.
one trusted source) and the *raw* pool to select from, DSIR scores every
raw document by the log-likelihood ratio of two bag-of-hashed-ngrams
unigram models:

    log w(x) = Σ_b c_b(x) · ( ln p_target[b] − ln p_raw[b] )

where ``b`` ranges over ``n_buckets`` hashed token buckets and ``c_b(x)``
is the document's bucket count.  Both models use add-one smoothing over
the bucket space, so every probability is a ratio of exact integers.

Determinism/oracle contract (house conventions):

- Buckets are salted-md5 hashes (``dsir:`` salt) — identical in any
  engine with md5, same idiom as ``cms._bucket``.
- The per-bucket log-ratio is quantized to 10^-6 **integer fixed point**
  (``floor(ln(r)·10^6 + 0.5)``), and the per-document score is an exact
  integer sum of ``c_b × lr_fp[b]`` — shuffle-order-proof, so ranking
  ties cannot flip between engines.  The probability ratio itself is
  built from IEEE-correctly-rounded ÷ on integers (bit-identical
  everywhere); ``ln`` is the one step without a correct-rounding
  guarantee, but ln of a rational ≠ 1 is irrational, so a quantization
  flip needs the two engines' ln to land on opposite sides of a
  half-ulp-wide boundary — unlike the dyadic-rational SRP case (see
  ``embedsim.SRP_QUANT_SCALE``) no input can sit exactly ON the
  boundary, and any flip perturbs one bucket's weight by 1e-6.
- Association order in the ratio expression mirrors the oracle SQL
  token-for-token.

Scale shape: two corpus passes build the bucket histograms — map-side
combinable groupBys collapsing into ≤ ``n_buckets`` cells each (bounded
state, mergeable, streaming-friendly).  The ≤ ``n_buckets``-row
log-ratio LUT is **broadcast**; the scoring pass is one explode →
broadcast-join → groupBy(doc) — a single shuffle keyed by doc id, then
``TakeOrderedAndProject`` for the selection top-k.  No corpus-sized
state ever reaches the driver.  (The paper resamples via Gumbel noise;
we take the deterministic top-k of the same weights so the selection is
oracle-checkable — swap in a salted-hash Gumbel perturbation for
variety without changing the plan shape.)

The reference has no data-selection surface; this is part of the
beyond-reference training-data mandate (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import normalized_text, tokens

#: Fixed-point scale for quantized per-bucket log-ratios — the repo-wide
#: 6-digit convention (BM25 contributions, SRP quantizer, PageRank mass).
DSIR_FP = 1_000_000.0


def _bucket(tok: Column, n_buckets: int) -> Column:
    """Salted md5 bucket in [0, n_buckets) — oracle twin:
    ``CAST('0x' || substr(md5('dsir:' || t), 1, 15) AS BIGINT) % n``."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit("dsir:"), tok)), 1, 15), 16, 10).cast(
        "long"
    )
    return F.pmod(h, F.lit(n_buckets))


def _bucket_counts(docs: DataFrame, text_col: str, n_buckets: int) -> DataFrame:
    """(b, c) histogram of the corpus token stream over hashed buckets."""
    return (
        docs.select(
            F.explode(tokens(normalized_text(F.col(text_col)))).alias("__t")
        )
        .select(_bucket(F.col("__t"), n_buckets).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    n_buckets: int = 1024,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` raw documents by DSIR hashed-unigram importance weight.

    Output: ``doc_id, n_toks, logw, rank`` — ``logw`` is the fixed-point
    log-likelihood-ratio sum / 10^6 (6 digits), ranked descending with
    doc-id tiebreak.  Documents with zero tokens score 0 and rank last
    among equals.
    """
    # ONE tokenize of the raw pool (optimization r12; guide §2.3/§2.4):
    # the bucket histogram and the per-doc probes both consume the raw
    # token stream, which Catalyst does not common-subexpression — the
    # md5 bucketing of every token used to run twice.  Aggregating to
    # per-(doc, bucket) counts first lets the histogram (sum over docs)
    # and the score (Σ cnt·lr_fp, an exact integer either way) derive
    # from the same single pass; the (doc, b) groupBy is map-side
    # combinable and strictly smaller than the token stream it replaces.
    from ...cache import _plan_key, derived_key, persist_slot

    probes = raw.select(
        F.col(id_col).alias("doc"),
        F.explode_outer(tokens(normalized_text(F.col(text_col)))).alias("__t"),
    ).select("doc", _bucket(F.col("__t"), n_buckets).alias("b"))
    db = probes.groupBy("doc", "b").agg(F.count(F.col("b")).alias("cnt"))
    # persisted: the LUT (via the broadcast build) and the scoring pass
    # are two consumers; without the pin the tokenize would still run
    # twice, once inside the broadcast subtree
    db = persist_slot(
        "dsir.doc_buckets",
        db,
        key=derived_key(
            _plan_key(raw), "dsir.db", n_buckets, id_col, text_col
        ),
    )

    t_hist = _bucket_counts(target, text_col, n_buckets)
    r_hist = (
        db.where(F.col("b").isNotNull())
        .groupBy("b")
        .agg(F.sum("cnt").alias("c"))
    )
    # Corpus totals as UNBOUNDED-WINDOW sums over the ≤n_buckets-row
    # histograms — never `hist.agg(...)` crossJoined back onto the same
    # un-persisted frame, which makes Catalyst evaluate the whole
    # tokenize+histogram subtree twice per corpus (the psi_report r8
    # defect class; caught here by tools/scan_audit.py).  The full outer
    # join + max-densify carries each side's total onto every row even
    # when the bucket sets barely overlap; the LUT then keeps only
    # raw-supported buckets (a probed bucket always has raw support;
    # target-only buckets are unreachable by probes).
    w_all = Window.partitionBy()
    t2 = t_hist.select(
        "b",
        F.col("c").alias("ct"),
        F.sum("c").over(w_all).cast("long").alias("st"),
    )
    r2 = r_hist.select(
        "b",
        F.col("c").alias("cr"),
        F.sum("c").over(w_all).cast("long").alias("sr"),
    )
    lut = (
        r2.join(t2, "b", "full")
        .withColumn("st", F.max("st").over(w_all))
        .withColumn("sr", F.max("sr").over(w_all))
        .where(F.col("cr").isNotNull())
    )
    # Mirrors the oracle token-for-token: two correctly-rounded divisions,
    # one division of the results, ln, then half-up fixed-point quantize.
    p_t = (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0)) / (
        F.col("st") + F.lit(float(n_buckets))
    )
    p_r = (F.col("cr") + F.lit(1.0)) / (F.col("sr") + F.lit(float(n_buckets)))
    lr_fp = F.floor(F.log(p_t / p_r) * F.lit(DSIR_FP) + F.lit(0.5)).cast("long")
    lut = lut.select("b", lr_fp.alias("lr_fp"))

    # score from the (doc, b, cnt) aggregate: Σ cnt·lr_fp is the same
    # exact integer as the former per-token Σ lr_fp; the zero-token doc
    # row (b NULL from explode_outer) has cnt = 0 and joins nothing, so
    # n_toks = Σ cnt and the coalesce handle it exactly as before
    scored = (
        db.join(F.broadcast(lut), "b", "left")
        .groupBy("doc")
        .agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_toks"),
            F.coalesce(
                F.sum(F.col("lr_fp") * F.col("cnt")), F.lit(0)
            ).alias("s_fp"),
        )
    )
    top = scored.orderBy(F.col("s_fp").desc(), F.col("doc").asc()).limit(k)
    w = Window.orderBy(F.col("s_fp").desc(), F.col("doc").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        F.col("doc").alias(id_col),
        "n_toks",
        F.round(F.col("s_fp") / F.lit(DSIR_FP), 6).alias("logw"),
        "rank",
    )


def _bigram_stream(docs: DataFrame, text_col: str, n_buckets: int) -> DataFrame:
    """(doc, pb, cb) hashed-bucket bigram stream: consecutive token pairs
    per document (docs with < 2 tokens contribute nothing).  Pairing is a
    per-row HOF zip of the token array with its tail — no shuffle."""
    toks = tokens(normalized_text(F.col(text_col)))
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("p"), b.alias("c")),
    )
    return docs.select(
        F.col("doc_id").alias("doc"), F.explode(pairs).alias("bg")
    ).select(
        "doc",
        _bucket(F.col("bg.p"), n_buckets).alias("pb"),
        _bucket(F.col("bg.c"), n_buckets).alias("cb"),
    )


def lm_quality_score(
    raw: DataFrame,
    target: DataFrame,
    *,
    n_buckets: int = 1024,
    text_col: str = "text",
    ndigits: int = 6,
) -> DataFrame:
    """CCNet-style LM quality scoring: per-document average negative
    log-likelihood under a bucketed-bigram language model trained on the
    *target* corpus (Wenzek et al. 2020 filter documents by the
    perplexity of a clean-corpus LM; low NLL ≈ target-like prose, high
    NLL ≈ boilerplate/garble).  Perplexity is ``exp(avg_nll)`` — a
    monotone transform, so ranking/thresholding on ``avg_nll`` is
    equivalent and avoids a second transcendental step.

    Model: ``p(cur|prev) = (c(prev,cur) + 1) / (c(prev) + B)`` over
    salted-md5 hashed token buckets (add-one smoothing; hashing bounds
    the model at B² cells regardless of corpus size, the same trick DSIR
    uses for its feature space).  Per-bigram NLL is quantized to 10^-6
    fixed point (``floor(-ln p · 10^6 + 0.5)``; ln's 1-ulp caveat as in
    :func:`dsir_weights`), summed exactly per doc, divided once.

    Scale shape: one corpus pass builds the bigram histogram (map-side
    combinable into ≤ B² non-empty cells) + one for the context counts
    (≤ B); the NLL LUT is **broadcast**; scoring is explode →
    broadcast-join → groupBy(doc).  Docs with < 2 tokens score NULL
    (no evidence ≠ good prose).

    Output: ``doc_id, n_bigrams, avg_nll`` for every raw doc.
    """
    t_bg = _bigram_stream(target, text_col, n_buckets)
    # ONE target pass: the context counts are the per-pb SUM of the
    # bigram histogram (Σ_cb c(pb,cb) ≡ c(pb)), so deriving them from
    # the ≤B²-row histogram instead of a second groupBy over t_bg keeps
    # Catalyst from evaluating the whole target tokenize+pair subtree
    # twice (the psi_report r8 defect class; tools/scan_audit.py).
    bg_hist = t_bg.groupBy("pb", "cb").agg(F.count(F.lit(1)).alias("cbg"))
    # ≤B² aggregated rows feeding TWO consumers (cell LUT + pb-default
    # LUT) — pinned in a plan-keyed slot so the target pass runs once,
    # not once per consumer
    from ...cache import persist_slot

    with_ctx = persist_slot(
        "importance.lm.bigram_hist",
        bg_hist.withColumn(
            "cctx", F.sum("cbg").over(Window.partitionBy("pb"))
        ),
    )

    # Smoothing decomposes into three broadcast tiers instead of a
    # probe-restricted LUT (which cost a SECOND full raw tokenize+pair
    # pass just to enumerate the probed cells):
    #   cell in target:            p = (cbg+1)/(cctx+B)   → bg LUT (≤B²)
    #   pb in target, cb unseen:   p = 1/(cctx+B)         → pb LUT (≤B)
    #   pb unseen:                 p = 1/B                → one constant
    # — identical arithmetic to the joined formula, cell by cell.
    def _nll(p: Column) -> Column:
        return F.floor(-F.log(p) * F.lit(DSIR_FP) + F.lit(0.5)).cast("long")

    bg_lut = with_ctx.select(
        "pb",
        "cb",
        _nll(
            (F.col("cbg") + F.lit(1.0))
            / (F.col("cctx") + F.lit(float(n_buckets)))
        ).alias("nll_fp"),
    )
    pb_lut = (
        with_ctx.groupBy("pb")
        .agg(F.max("cctx").alias("cctx"))
        .select(
            "pb",
            _nll(
                F.lit(1.0) / (F.col("cctx") + F.lit(float(n_buckets)))
            ).alias("nll0_fp"),
        )
    )
    # the pb-unseen constant folds JVM-side (same ln as every other cell)
    g_fp = _nll(F.lit(1.0) / F.lit(float(n_buckets)))

    doc_bg = _bigram_stream(raw, text_col, n_buckets)
    scored = (
        doc_bg.join(F.broadcast(bg_lut), ["pb", "cb"], "left")
        .join(F.broadcast(pb_lut), "pb", "left")
        .withColumn(
            "__nll",
            F.coalesce(F.col("nll_fp"), F.col("nll0_fp"), g_fp),
        )
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__nll").alias("s_fp"),
        )
    )
    ids = raw.select(F.col("doc_id").alias("doc"))
    return ids.join(scored, "doc", "left").select(
        F.col("doc").alias("doc_id"),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.round(
            F.col("s_fp") / (F.col("n_bigrams") * F.lit(DSIR_FP)), ndigits
        ).alias("avg_nll"),
    )
