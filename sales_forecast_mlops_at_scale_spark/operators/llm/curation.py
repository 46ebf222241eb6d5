"""Training-data curation operators: deterministic sampling, per-source
caps, token-budget shard packing, and the composed keep/drop decision.

These are the steps between "a batch of scraped documents" and "a
training mix": downsample deterministically, bound any single source's
share, pack the survivors into fixed-token-budget shards, and record WHY
each dropped doc was dropped.  All pure relational plans (windows +
hashes + joins); determinism comes from md5-derived keys, never RNG, so
every step is oracle-checkable and reproducible across runs and engines.

Scale notes: sampling and capping are one window/filter over the scan;
shard packing is a running sum per ``pack_by`` partition (shuffle on the
partition key only — pack within language/source groups rather than a
global order, which would serialize).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import normalized_text, tokens


def sample_threshold_hex(fraction: float) -> str:
    """The 8-hex-char threshold for :func:`deterministic_sample`.
    Lowercase-hex strings compare lexicographically exactly like their
    numeric values, so the keep test is a plain string comparison in any
    engine."""
    return format(int(fraction * 0xFFFFFFFF), "08x")


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    *,
    id_col: str = "doc_id",
    seed: str = "sample",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by a salted md5 of the id —
    stable across runs, partitionings, and engines (no RNG, no
    ``sample()`` nondeterminism).  The first 8 md5 hex chars are compared
    against the fraction's hex threshold as strings."""
    bucket = F.substring(
        F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 8
    )
    return df.filter(bucket < F.lit(sample_threshold_hex(fraction)))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    *,
    id_col: str = "doc_id",
    max_weight: int = 64,
    seed: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sample of ``k`` rows, inclusion odds
    increasing with integer ``weight_col`` — the quality-weighted
    subsampling step of a curation mix (sample ∝ quality score, doc
    length, or source priority) with zero RNG and zero transcendental
    functions, so the result is bit-reproducible in any engine with md5.

    Mechanism (replicated min-wise sampling): each row is expanded into
    ``min(weight, max_weight)`` UNITS, each unit draws an independent
    salted md5 hash, a row's key is its minimum unit hash, and the ``k``
    smallest keys win (id tie-break).  Treating units as the sampled
    population makes this exactly uniform sampling over weight units
    deduplicated to rows — the classic integer-weight reduction of
    weighted sampling without replacement.  A float-weight A-ES
    (``u^(1/w)``) needs ``ln``/``exp``, which are not correctly-rounded
    and therefore cannot be hash-verified across engines; integer
    replication is the oracle-exact form.  ``max_weight`` caps the
    fan-out (a weight beyond the cap saturates — document the cap as
    part of the sampling design, the same honesty as any clipped
    importance weight).

    Scale shape: the explode is ≤ ``max_weight`` rows per input row with
    the min collapsed by a map-side-combinable groupBy BEFORE the
    top-``k`` (TakeOrdered — per-partition heads, no global sort).
    Output: the sampled rows' ``id_col, weight, sample_rank``.
    """
    w_int = F.least(F.col(weight_col).cast("long"), F.lit(max_weight))
    units = df.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias("weight"),
        F.explode(F.sequence(F.lit(1), w_int)).alias("__u"),
    ).where(F.col("weight") >= 1)
    keyed = (
        units.select(
            id_col,
            "weight",
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(seed),
                        F.col(id_col).cast("string"),
                        F.col("__u").cast("string"),
                    )
                ),
                1,
                15,
            ).alias("__h"),
        )
        .groupBy(id_col, "weight")
        .agg(F.min("__h").alias("__key"))
    )
    # orderBy+limit FIRST (TakeOrderedAndProject: per-partition heads,
    # no global sort); the rank window then runs over ≤ k rows
    top = keyed.orderBy(F.col("__key").asc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("__key").asc(), F.col(id_col).asc())
    return (
        top.withColumn("sample_rank", F.row_number().over(w))
        .select(id_col, "weight", "sample_rank")
    )


def cap_per_group(
    df: DataFrame,
    keys: Sequence[str],
    *,
    cap: int,
    order_by: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """At most ``cap`` rows per key group (deterministic order) — bounds
    any one source/domain's share of the training mix."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def pack_shards(
    df: DataFrame,
    *,
    token_col: str,
    budget: int,
    pack_by: Sequence[str] = (),
    order_by: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Assign each doc a shard id such that each shard holds ~``budget``
    tokens: running token sum per ``pack_by`` partition, integer-divided
    by the budget.  (A doc straddling a boundary goes to the shard its
    cumulative END falls in — the standard greedy packing.)

    With empty ``pack_by`` this is a single global order — correct but
    serial; at scale always pack within a partition key (lang, source)."""
    part = [F.col(c) for c in pack_by] if pack_by else [F.lit(1)]
    w = (
        Window.partitionBy(*part)
        .orderBy(*[F.col(c) for c in order_by])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # greatest(cum, 1): a zero-token head row would otherwise hit
    # (0-1)/budget, where truncation (Spark cast) and floor division
    # (SQL //) disagree on negatives
    cum = F.greatest(F.sum(F.col(token_col)).over(w), F.lit(1))
    return df.withColumn("shard", ((cum - 1) / F.lit(budget)).cast("long"))


def curation_decision(
    docs: DataFrame,
    *,
    quality: DataFrame,
    langs: Sequence[str],
    dup_drop: DataFrame,
    min_quality: float,
    source_cap: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """The composed keep/drop decision with reasons — the audit artifact a
    curation pipeline materializes next to the training mix.

    Order of elimination: duplicate → language → quality → source cap
    (each doc gets the FIRST reason that disqualifies it; the cap ranks
    only among docs that survived the earlier filters).  Output:
    ``doc_id, keep, reason``."""
    q = quality.select(id_col, "quality_score")
    dup = dup_drop.select(F.col(id_col).alias("__dup_id")).distinct()
    flagged = (
        docs.join(q, id_col, "left")
        .join(dup, docs[id_col] == F.col("__dup_id"), "left")
        .withColumn("__is_dup", F.col("__dup_id").isNotNull())
        .withColumn("__lang_ok", F.col("lang").isin(*langs))
        .withColumn("__qual_ok", F.col("quality_score") >= min_quality)
        .withColumn(
            "__surv",
            (~F.col("__is_dup")) & F.col("__lang_ok") & F.col("__qual_ok"),
        )
    )
    w_cap = Window.partitionBy("source", "__surv").orderBy(id_col)
    flagged = flagged.withColumn("__rk", F.row_number().over(w_cap))
    keep = F.col("__surv") & (F.col("__rk") <= source_cap)
    reason = (
        F.when(F.col("__is_dup"), "duplicate")
        .when(~F.col("__lang_ok"), "language")
        .when(~F.col("__qual_ok"), "quality")
        .when(F.col("__rk") > source_cap, "source_cap")
        .otherwise("kept")
    )
    return flagged.select(F.col(id_col), keep.alias("keep"), reason.alias("reason"))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_tokens: int = 64,
) -> DataFrame:
    """Split each document into consecutive ``max_tokens``-token chunks —
    the context-window packing step between curation and tokenization in
    a training pipeline (every document becomes ⌈n/max⌉ sequences; the
    final partial chunk is kept, empty documents yield none).

    Pure higher-order functions: tokenize once, then one ``transform``
    over ``sequence(0, n_chunks-1)`` slices the token array — a per-row
    map with NO shuffle and no Python.  ``posexplode`` numbers chunks
    1-based.  At 100 TB this is embarrassingly parallel; the only
    downstream consideration is re-bucketing chunks if later stages
    group by chunk rather than document.

    Output: ``id_col, chunk_id, n_tokens, chunk``.
    """
    from .textstats import normalized_text, tokens

    toks = df.select(
        F.col(id_col), tokens(normalized_text(F.col(text_col))).alias("__toks")
    ).filter(F.size("__toks") > 0)
    # (the filter also guards sequence(): Spark's sequence(0, -1) steps
    # DOWNWARD for empty docs instead of yielding an empty array)
    m = max_tokens
    chunks = toks.select(
        id_col,
        F.transform(
            F.sequence(F.lit(0), F.ceil(F.size("__toks") / F.lit(m)).cast("int") - 1),
            lambda i: F.slice(F.col("__toks"), i * m + 1, m),
        ).alias("__chunks"),
    )
    ex = chunks.select(id_col, F.posexplode("__chunks").alias("pos", "chunk_toks"))
    return ex.select(
        id_col,
        (F.col("pos") + 1).cast("int").alias("chunk_id"),
        F.size("chunk_toks").alias("n_tokens"),
        F.array_join("chunk_toks", " ").alias("chunk"),
    )


def mix_to_weights(
    df: DataFrame,
    weights: dict[str, float],
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Down-sample sources to hit a target dataset mixture — the
    "data recipe" step of a training pipeline (e.g. web 50% / books 30% /
    code 20%).  Sources not named in ``weights`` are dropped.

    The binding source (smallest ``count/weight`` ratio) is kept whole;
    every other source is deterministically md5-threshold-sampled (see
    :func:`deterministic_sample`) down to ``T * w_s`` expected rows,
    where ``T = min_s(n_s / w_s)`` is the largest total the recipe
    supports.  All math is count-ratio double division (IEEE exact, same
    in any engine); the per-source counts are a tiny driver-side agg of
    one row per source — catalog-grade, not data-grade.
    """
    rows = (
        df.filter(F.col(source_col).isin(list(weights)))
        .groupBy(source_col)
        .count()
        .collect()
    )
    counts = {r[0]: r[1] for r in rows}
    missing = sorted(set(weights) - set(counts))
    if missing:
        raise ValueError(f"sources absent from data: {missing}")
    total = min(counts[s] / w for s, w in weights.items())
    bucket = F.substring(
        F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 8
    )
    keep = None
    for s, w in weights.items():
        frac = min(1.0, (total * w) / counts[s])
        cond = (F.col(source_col) == s) & (
            bucket < F.lit(sample_threshold_hex(frac))
        )
        keep = cond if keep is None else keep | cond
    return df.filter(keep)


def split_expr(id_col: Column, *, seed: str = "split") -> Column:
    """Deterministic train/val/test assignment (80/10/10) from a salted
    md5 of the id — the same engine-portable hex-threshold trick as
    :func:`deterministic_sample`, so any engine reproduces the split
    bit-for-bit.  A pure expression (no join against an assignment
    table): downstream queries evaluate it inline on either side of a
    pair without shuffling an id→split map."""
    bucket = F.substring(F.md5(F.concat(F.lit(seed), id_col.cast("string"))), 1, 8)
    return (
        F.when(bucket < F.lit(sample_threshold_hex(0.8)), F.lit("train"))
        .when(bucket < F.lit(sample_threshold_hex(0.9)), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def split_sql_expr(id_sql: str, *, seed: str = "split") -> str:
    """DuckDB twin of :func:`split_expr` — identical salt, thresholds,
    and hex comparison."""
    b = f"substr(md5('{seed}' || CAST({id_sql} AS VARCHAR)), 1, 8)"
    return (
        f"CASE WHEN {b} < '{sample_threshold_hex(0.8)}' THEN 'train' "
        f"WHEN {b} < '{sample_threshold_hex(0.9)}' THEN 'val' "
        f"ELSE 'test' END"
    )


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    *,
    budget: int,
    id_col: str = "doc_id",
    seed: str = "strat",
) -> DataFrame:
    """Deterministic stratified sample with **square-root allocation**: a
    total ``budget`` of rows is split across strata proportionally to
    ``sqrt(stratum size)`` — the standard compromise between proportional
    sampling (huge web strata drown everything) and equal allocation
    (tiny strata get oversampled past their usable size); cf. the
    per-source balancing used in mixture-built corpora (The Pile,
    Gopher/MassiveText).  Within each stratum rows are chosen by salted
    md5 rank — stable across runs, partitionings, and engines.

    Exact-integer allocation (oracle contract): ``sqrt`` IS IEEE-
    correctly-rounded (unlike ln/exp), so ``q_s = floor(sqrt(n_s)·10^6 +
    0.5)`` is bit-identical everywhere; allocations are then integer
    arithmetic: ``alloc_s = (budget · q_s) div Σ q_s``.  Small strata
    whose allocation exceeds their size are naturally capped by the rank
    filter (the leftover budget is deliberately NOT redistributed — a
    second pass would need another aggregate; callers who need the full
    budget re-run with the rounding slack added).

    Scale shape: one map-side-combinable count per stratum (≤ #strata
    rows, broadcast back), one window rank per stratum over the salted
    hash — a single shuffle keyed by the strata columns.

    Output: sampled rows as ``*strata, id_col, alloc``.
    """
    gcols = list(strata)
    counts = df.groupBy(*gcols).agg(F.count(F.lit(1)).alias("__n"))
    q = F.floor(F.sqrt(F.col("__n")) * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
    counts = counts.withColumn("__q", q)
    tot = counts.agg(F.sum("__q").alias("__tq"))
    # The budget·q_s product is computed in DECIMAL(38,0): as int64 it
    # wraps silently (ANSI off) once budget·sqrt(n_s)·10^6 exceeds
    # 2^63 — reachable at petabyte scale (budget 1e7 over a 1e14-row
    # stratum).  DIV on decimal is still exact integral division, and
    # the quotient (≤ budget) always fits back in a long.
    alloc = counts.crossJoin(F.broadcast(tot)).select(
        *gcols,
        F.expr(f"CAST(CAST({budget} AS DECIMAL(38,0)) * __q DIV __tq AS BIGINT)")
        .alias("alloc"),
    )
    h = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy(*gcols).orderBy(h.asc(), F.col(id_col).asc())
    ranked = df.select(*gcols, id_col).withColumn("__rk", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(alloc), gcols)
        .filter(F.col("__rk") <= F.col("alloc"))
        .select(*gcols, id_col, "alloc")
    )


def span_corruption_masks(
    df: DataFrame,
    *,
    block: int = 5,
    span: int = 3,
    mask_every: int = 4,
    seed: str = "spans",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic span-corruption masks (T5/UL2 denoising prep): for
    each document, non-overlapping token spans to mask, chosen by salted
    hashes — reproducible across runs/engines, no RNG state.

    Blocked scheme (stateless ⇒ oracle-expressible, unlike greedy
    sequential span sampling whose each choice depends on the previous):
    token positions are tiled into ``block``-sized blocks; a block is
    selected when ``md5(seed|doc|block) % mask_every == 0`` (≈1/
    ``mask_every`` corruption density); within a selected block the span
    starts at the position minimizing a second salted hash and runs
    ``span`` tokens, clipped to the block — block-locality makes spans
    non-overlapping BY CONSTRUCTION.  Per-row HOF work only: zero
    shuffle at any scale.

    Output: one row per masked span — ``doc_id, span_start, span_len``
    (0-based token offsets; docs with no selected blocks emit nothing).
    """
    toks = tokens(normalized_text(F.col(text_col)))
    n = F.size(toks)
    # nblocks is built over the PROJECTED count column (__n), not the
    # raw text column — the text is pruned before the block explode
    nblocks = F.ceil(F.col("__n") / F.lit(block)).cast("int")
    bsel = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed + ":b:"),
                        F.col(id_col).cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % mask_every
        == 0
    )
    pos_h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(seed + ":p:"),
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    F.col("p").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    blocks = (
        df.select(F.col(id_col), n.alias("__n"))
        .filter(F.col("__n") > 0)
        .select(
            id_col,
            "__n",
            F.explode(F.sequence(F.lit(0), nblocks - 1)).alias("b"),
        )
        .filter(bsel)
    )
    # candidate positions of the selected block, clipped to the doc tail
    cand = blocks.select(
        id_col,
        "__n",
        "b",
        F.explode(
            F.sequence(
                F.col("b") * block,
                F.least(F.col("b") * block + block - 1, F.col("__n") - 1),
            )
        ).alias("p"),
    ).withColumn("__h", pos_h)
    w = Window.partitionBy(id_col, "b").orderBy(F.col("__h").asc(), F.col("p").asc())
    starts = cand.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") == 1)
    span_len = F.least(
        F.lit(span), (F.col("b") + 1) * block - F.col("p"), F.col("__n") - F.col("p")
    )
    return starts.select(
        id_col,
        F.col("p").alias("span_start"),
        span_len.cast("int").alias("span_len"),
    )
