"""Product quantization (PQ) for embedding compression + ADC search
(Jégou et al. 2011, "Product Quantization for Nearest Neighbor Search")
— the memory tier under IVF in every production 100 TB vector stack
(faiss IVFPQ): a D-dim float vector becomes M codebook indices (one byte
each at K ≤ 256; 4 bits at the fixture's K=16), a 16× compression at
the fixture geometry, and query
scan cost drops from D multiplies per vector to M table lookups.

Determinism/oracle contract (house conventions):

- Codewords are a hash-selected corpus subset — the same Knuth
  multiplicative-hash ``ORDER BY LIMIT`` used for IVF centroids
  (TakeOrderedAndProject, no RNG); :func:`embedsim.kmeans_refine` can
  slot in per subspace exactly as it does for IVF.
- Sub-distances are left-to-right float folds (``F.aggregate`` here,
  ``list_sum`` comprehensions in the oracle — identical association, so
  bit-identical doubles), quantized to 10^-6 integer fixed point with
  the tie-free ``floor(x·10^6 + 0.5)`` convention.
- Encoding argmin and ADC ranking order by the QUANTIZED integer with
  codeword/id tie-breaks — no float comparisons cross the engine
  boundary anywhere.

Scale shape:

- **Codebook**: K corpus rows → M·K sub-codewords, Lloyd-refined with
  bounded state (assignments never leave the executors; the update is a
  map-side-combinable quantized sum into M·K·(D/M) cells); broadcast
  everywhere.
- **Encode**: explode each vector into M subvectors (M× row fan-out of
  D/M-wide rows — same bytes as the input), broadcast-join the
  codebook, and take the per-(vector, subspace) argmin as a ``min(
  struct(d_fp, cid))`` hash aggregate — map-side combinable, no window,
  no corpus-sized shuffle of full vectors.
- **ADC search**: the query×codebook distance table (Q·M·K rows) is
  broadcast; candidate scoring is codes ⋈ table on (subspace, code) —
  M small integer rows per (query, vector) — then an exact integer sum
  and ``TakeOrderedAndProject``-style top-k.  The corpus side ships
  only its codes: the whole search runs without touching a float
  vector, which is the entire point of PQ at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .embedsim import SRP_QUANT_SCALE, _prepared

#: Fixture geometry: 64-dim vectors → 32 subspaces × 2 dims, 16 codewords
#: per subspace = 4 bits each, 16 B/vector (16× vs float32).  Chosen by a
#: measured recall sweep on the near-orthogonal fixtures: (M=8,K=16) 0.05,
#: (16,16) 0.225, (32,16) 0.575 at sf0.1 — unstructured data needs fine
#: subspaces; clustered production embeddings run coarser (M=8..16,K=256).
PQ_M = 32
PQ_K = 16


def _subspaces(df: DataFrame, *, m: int, vec_col: str = "v") -> DataFrame:
    """Explode ``(…, v)`` into ``(…, m, sv)`` sub-vector rows.  Dims must
    divide evenly by ``m`` — enforced per row with ``raise_error`` (the
    same guard class as ``embedsim._srp_band_udf``'s nbits/band_bits
    check); a silent non-divisible slice would drift subspace boundaries
    and drop trailing dims with no symptom but degraded recall."""
    sz = F.size(F.col(vec_col))
    d_sub = F.when(
        sz % m == 0, (sz / m).cast("int")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"PQ subspaces: dim must divide by m={m}, got "),
                sz.cast("string"),
            )
        ).cast("int")
    )
    subs = F.array(
        *[
            F.struct(
                F.lit(i).alias("m"),
                F.slice(
                    F.col(vec_col), F.lit(i) * d_sub + 1, d_sub
                ).alias("sv"),
            )
            for i in range(m)
        ]
    )
    return df.withColumn("__s", F.explode(subs)).select(
        *[c for c in df.columns if c != vec_col],
        F.col("__s.m").alias("m"),
        F.col("__s.sv").alias("sv"),
    )


def _sqdist_fp(a, b):
    """floor(‖a−b‖²·10^6 + 0.5) as int64 — a left-to-right fold matching
    the oracle's ``list_sum`` comprehension association exactly."""
    sq = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.floor(sq * F.lit(SRP_QUANT_SCALE) + F.lit(0.5)).cast("long")


def _unit(df: DataFrame) -> DataFrame:
    """(vid, v) with v unit-normalized: PQ quantizes DIRECTIONS so the
    L2-based ADC ranking matches the exact tier's cosine ranking
    (‖a−b‖² = 2 − 2·cos(a,b) on the unit sphere).  Without this, ADC
    orders by raw L2, which disagrees with cosine whenever vector
    magnitudes vary (the fixtures happen to be near-equal-norm, so the
    correctness argument, not a fixture measurement, motivates it)."""
    return df.select(
        "vid", F.transform("v", lambda x: x / F.col("nrm")).alias("v")
    )


def pq_codebook(
    corpus: DataFrame,
    *,
    m: int = PQ_M,
    k: int = PQ_K,
    refine_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(m, cid, cv)`` sub-codewords: seeded from the K hash-selected
    corpus vectors (IVF's deterministic pick) split into M subspaces,
    then ``refine_iters`` per-subspace L2 Lloyd iterations — PQ codebooks
    are k-means codebooks per subspace (Jégou et al. §II).  Training is
    what makes the quantizer: measured recall@5 at sf0.1 (M=32, K=16)
    is 0.30 seeded → 0.525 after one iteration → 0.575 at two
    (plateau) — on par with the IVF tier's 0.588 at 16× compression."""
    c = _unit(_prepared(corpus, id_col, vec_col))
    cent_hash = F.pmod(
        F.col("vid").cast("long") * F.lit(2654435761), F.lit(2147483648)
    )
    cw = c.orderBy(cent_hash.asc(), F.col("vid").asc()).limit(k).select("vid", "v")
    cb = _subspaces(cw, m=m).select(
        "m", F.col("vid").alias("cid"), F.col("sv").alias("cv")
    )
    if refine_iters:
        sub = _subspaces(c, m=m)
        cb = pq_refine(sub, cb, iters=refine_iters)
    return cb


def pq_refine(sub: DataFrame, codebook: DataFrame, *, iters: int = 2) -> DataFrame:
    """Per-subspace L2 Lloyd refinement of a PQ codebook, deterministic
    across engines/partitionings — the PQ analogue of
    :func:`embedsim.kmeans_refine` and the same arithmetic discipline:
    assignment orders by the 10^-6-quantized squared distance with
    codeword-id tie-break; the update step sums ``floor(x·10^6 + 0.5)``-
    quantized components EXACTLY in int64 and divides once, so the new
    codewords are bit-identical on any engine and the SQL twin unrolls
    the same iterations as CTEs.  Empty cells keep their previous
    codeword.  Pure plan construction — no driver actions."""
    for _ in range(iters):
        assigned = (
            sub.join(F.broadcast(codebook), "m")
            .select(
                "vid",
                "m",
                "sv",
                F.struct(
                    _sqdist_fp(F.col("sv"), F.col("cv")).alias("d_fp"),
                    F.col("cid").alias("cid"),
                ).alias("__dc"),
            )
            .groupBy("vid", "m")
            # one sub row per (vid, m) pre-join, so first(sv) is unique
            .agg(F.min("__dc").alias("__b"), F.first("sv").alias("sv"))
            .select("m", F.col("__b.cid").alias("cid"), "sv")
        )
        q = assigned.select(
            "m",
            "cid",
            F.posexplode(
                F.transform(
                    F.col("sv"),
                    lambda x: F.floor(x * SRP_QUANT_SCALE + F.lit(0.5)).cast("long"),
                )
            ).alias("pos", "qx"),
        )
        sums = q.groupBy("m", "cid", "pos").agg(
            F.sum("qx").alias("s"), F.count(F.lit(1)).alias("n")
        )
        upd = sums.groupBy("m", "cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s", "n"))),
                lambda st: st["s"] / (st["n"] * F.lit(float(SRP_QUANT_SCALE))),
            ).alias("ncv")
        )
        codebook = codebook.join(upd, ["m", "cid"], "left").select(
            "m", "cid", F.coalesce("ncv", "cv").alias("cv")
        )
    return codebook


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    *,
    m: int = PQ_M,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vid, m, code)`` PQ codes: per (vector, subspace), the codeword
    minimizing the quantized squared distance (codeword-id tie-break) —
    a ``min(struct(d_fp, cid))`` hash aggregate, map-side combinable."""
    sub = _subspaces(_unit(_prepared(corpus, id_col, vec_col)), m=m)
    scored = sub.join(F.broadcast(codebook), "m").select(
        "vid",
        "m",
        F.struct(
            _sqdist_fp(F.col("sv"), F.col("cv")).alias("d_fp"),
            F.col("cid").alias("cid"),
        ).alias("__dc"),
    )
    return scored.groupBy("vid", "m").agg(F.min("__dc").alias("__best")).select(
        "vid", "m", F.col("__best.cid").alias("code")
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    m: int = PQ_M,
    n_codewords: int = PQ_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-``k``: exact query-to-codeword distance
    tables, corpus side represented ONLY by its codes.

    Output: ``q_id, nn_id, adist, rank`` — ``adist`` is the fixed-point
    ADC squared distance / 10^6 (ascending = nearer), ranked with nn-id
    tie-break; the query itself is excluded.
    """
    codebook = pq_codebook(
        corpus, m=m, k=n_codewords, id_col=id_col, vec_col=vec_col
    )
    codes = pq_encode(corpus, codebook, m=m, id_col=id_col, vec_col=vec_col)
    q_sub = _subspaces(
        _unit(_prepared(queries, id_col, vec_col)).select(
            F.col("vid").alias("qid"), "v"
        ),
        m=m,
    )
    dtable = q_sub.join(F.broadcast(codebook), "m").select(
        "qid",
        "m",
        F.col("cid").alias("code"),
        _sqdist_fp(F.col("sv"), F.col("cv")).alias("d_fp"),
    )
    scored = (
        codes.join(F.broadcast(dtable), ["m", "code"])
        .filter(F.col("qid") != F.col("vid"))
        .groupBy("qid", "vid")
        .agg(F.sum("d_fp").alias("s_fp"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("s_fp").asc(), F.col("vid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("q_id"),
            F.col("vid").alias("nn_id"),
            F.round(F.col("s_fp") / F.lit(SRP_QUANT_SCALE), 6).alias("adist"),
            "rank",
        )
    )
