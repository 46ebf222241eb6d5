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
    t_hist = _bucket_counts(target, text_col, n_buckets)
    r_hist = _bucket_counts(raw, text_col, n_buckets)
    t_tot = t_hist.agg(F.sum("c").cast("long").alias("st"))
    r_tot = r_hist.agg(F.sum("c").cast("long").alias("sr"))

    # LUT over buckets present in the RAW pool (a probed bucket always
    # has raw support; target-only buckets are unreachable by probes).
    lut = (
        r_hist.withColumnRenamed("c", "cr")
        .join(t_hist.withColumnRenamed("c", "ct"), "b", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
    )
    # Mirrors the oracle token-for-token: two correctly-rounded divisions,
    # one division of the results, ln, then half-up fixed-point quantize.
    p_t = (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0)) / (
        F.col("st") + F.lit(float(n_buckets))
    )
    p_r = (F.col("cr") + F.lit(1.0)) / (F.col("sr") + F.lit(float(n_buckets)))
    lr_fp = F.floor(F.log(p_t / p_r) * F.lit(DSIR_FP) + F.lit(0.5)).cast("long")
    lut = lut.select("b", lr_fp.alias("lr_fp"))

    probes = raw.select(
        F.col(id_col).alias("doc"),
        F.explode_outer(tokens(normalized_text(F.col(text_col)))).alias("__t"),
    ).select("doc", _bucket(F.col("__t"), n_buckets).alias("b"))
    scored = (
        probes.join(F.broadcast(lut), "b", "left")
        .groupBy("doc")
        .agg(
            F.count(F.col("b")).alias("n_toks"),
            F.coalesce(F.sum("lr_fp"), F.lit(0)).alias("s_fp"),
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
