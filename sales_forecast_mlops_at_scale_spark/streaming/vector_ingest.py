"""Streaming vector-index ingest — incremental IVF-PQ maintenance, the
embedding twin of :mod:`streaming.dedup_ingest`: every production vector
store ingests embeddings continuously but trains its quantizers rarely.

Tables maintained under ``root_path``:

- ``{root}/vectors``    — raw ``(id, embedding)`` rows (the re-rank tier)
- ``{root}/centroids``  — the coarse quantizer, trained ONCE from the
  first batch (hash-pick + Lloyd, :func:`embedsim.ivf_topk`'s recipe)
  and then FROZEN — faiss's operational model: assignment must stay
  consistent across the index's lifetime; retraining is an offline
  rebuild, not an ingest-path mutation
- ``{root}/pq_codebook`` — residual PQ codebook, same train-once policy
- ``{root}/assignments`` — ``(id, bucket)`` coarse assignments
- ``{root}/codes``      — ``(id, bucket, m, code)`` residual PQ codes,
  the compressed search tier

Per-batch cost is O(batch): one broadcast-join assignment pass and one
broadcast-join encode pass over the batch only — the stored corpus is
never rescanned.  Redelivery is idempotent via the same per-batch commit
marker + per-table anti-join healing protocol as the other ingests
(:func:`streaming.ingest.idempotent_append_batch`).

ANN search over the materialized index is exactly
:func:`operators.llm.pq.ivfpq_topk`'s probe/ADC dataflow reading the
stored tables instead of rebuilding them — :func:`search_materialized`
wires it up for completeness (and the tests exercise it).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cache import _plan_key, derived_key
from ..operators.llm.embedsim import SRP_QUANT_SCALE, _assign_nearest, _prepared
from ..operators.llm.pq import (
    PQ_K,
    PQ_M,
    _sqdist_fp,
    _subspaces,
    pq_refine,
)


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise


def _train_quantizers(
    batch: DataFrame,
    *,
    num_centroids: int,
    m: int,
    n_codewords: int,
    dim: int | None,
    id_col: str,
    vec_col: str,
) -> tuple[DataFrame, DataFrame]:
    """(centroids, pq_codebook) trained on the seed batch — hash-picked
    + Lloyd-refined residual codebook, the ivfpq_topk recipe."""
    c = _prepared(batch, id_col, vec_col)
    cent_hash = F.pmod(
        F.col("vid").cast("long") * F.lit(2654435761), F.lit(2147483648)
    )
    centroids = (
        c.orderBy(cent_hash.asc(), F.col("vid").asc())
        .limit(num_centroids)
        .select(
            F.col("vid").alias("cid"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cnrm"),
        )
    )
    assigned = _assign_nearest(c, centroids, "bucket", 6)
    ucent = centroids.select(
        F.col("cid").alias("bucket"),
        F.transform("cv", lambda x: x / F.col("cnrm")).alias("ucv"),
    )
    resid = (
        assigned.select(
            "vid", "bucket", F.transform("v", lambda x: x / F.col("nrm")).alias("uv")
        )
        .join(F.broadcast(ucent), "bucket")
        .select("vid", F.zip_with("uv", "ucv", lambda a, b: a - b).alias("v"))
    )
    seed_hash = F.pmod(
        F.col("vid").cast("long") * F.lit(2246822519), F.lit(2147483648)
    )
    seeds = (
        resid.orderBy(seed_hash.asc(), F.col("vid").asc())
        .limit(n_codewords)
        .select("vid", "v")
    )
    cb0 = _subspaces(seeds, m=m).select(
        "m", F.col("vid").alias("cid"), F.col("sv").alias("cv")
    )
    cb = pq_refine(
        _subspaces(resid, m=m).select("vid", "m", "sv"),
        cb0,
        iters=2,
        d_sub=dim // m if dim else None,
        # cheap derived key: the deep Lloyd plan must not be traversed
        # per batch (see cache.derived_key)
        key=derived_key(_plan_key(c), "vecingest.cb", num_centroids, m, n_codewords, dim),
    )
    return centroids, cb


def vector_ingest_batch(
    batch_df: DataFrame,
    root_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    m: int = PQ_M,
    n_codewords: int = PQ_K,
    dim: int | None = None,
    batch_id: int | None = None,
    app_id: str = "default",
) -> None:
    """foreachBatch body: train quantizers on the first batch, then
    assign + encode ONLY this batch and append all tiers in lockstep."""
    from .ingest import _commit_marker_path

    spark = batch_df.sparkSession
    fs = marker = None
    if batch_id is not None:
        fs, marker = _commit_marker_path(spark, root_path, f"{app_id}-{batch_id}")
        if fs.exists(marker):
            return
    batch_df = batch_df.dropDuplicates([id_col]).persist()

    centroids = _read_or_none(spark, f"{root_path}/centroids")
    codebook = _read_or_none(spark, f"{root_path}/pq_codebook")
    if centroids is None or codebook is None:
        cent, cb = _train_quantizers(
            batch_df,
            num_centroids=num_centroids,
            m=m,
            n_codewords=n_codewords,
            dim=dim,
            id_col=id_col,
            vec_col=vec_col,
        )
        # overwrite (not append): training is a single atomic event; a
        # torn retry rewrites the identical deterministic result
        cent.write.mode("overwrite").parquet(f"{root_path}/centroids")
        cb.write.mode("overwrite").parquet(f"{root_path}/pq_codebook")
        centroids = spark.read.parquet(f"{root_path}/centroids")
        codebook = spark.read.parquet(f"{root_path}/pq_codebook")

    # O(batch) passes: assign + residual-encode this batch only
    c = _prepared(batch_df, id_col, vec_col)
    assigned = _assign_nearest(c, centroids, "bucket", 6)
    ucent = centroids.select(
        F.col("cid").alias("bucket"),
        F.transform("cv", lambda x: x / F.col("cnrm")).alias("ucv"),
    )
    resid = (
        assigned.select(
            "vid", "bucket", F.transform("v", lambda x: x / F.col("nrm")).alias("uv")
        )
        .join(F.broadcast(ucent), "bucket")
        .select(
            "vid", "bucket", F.zip_with("uv", "ucv", lambda a, b: a - b).alias("v")
        )
    )
    d_sub = dim // m if dim else None
    enc = _subspaces(resid, m=m).join(F.broadcast(codebook), "m").select(
        "vid",
        "bucket",
        "m",
        F.struct(
            _sqdist_fp(F.col("sv"), F.col("cv"), d_sub).alias("d_fp"),
            F.col("cid").alias("cid"),
        ).alias("__dc"),
    )
    codes = (
        enc.groupBy("vid", "bucket", "m")
        .agg(F.min("__dc").alias("__b"))
        .select("vid", "bucket", "m", F.col("__b.cid").alias("code"))
    )

    def _append(delta: DataFrame, table: str, key: str) -> None:
        existing = _read_or_none(spark, f"{root_path}/{table}")
        if existing is not None:
            delta = delta.join(
                existing.select(key).distinct(), key, "left_anti"
            )
        delta.write.mode("append").parquet(f"{root_path}/{table}")

    _append(batch_df.select(id_col, vec_col), "vectors", id_col)
    _append(
        assigned.select(F.col("vid").alias(id_col), "bucket"),
        "assignments",
        id_col,
    )
    _append(
        codes.select(F.col("vid").alias(id_col), "bucket", "m", "code"),
        "codes",
        id_col,
    )
    batch_df.unpersist()
    if marker is not None:
        fs.createNewFile(marker)  # marker LAST — see ingest.py


def search_materialized(
    spark: SparkSession,
    root_path: str,
    queries: DataFrame,
    *,
    k: int = 5,
    nprobe: int = 4,
    m: int = PQ_M,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ndigits: int = 6,
) -> DataFrame:
    """IVF-PQ ADC search over the MATERIALIZED index — the probe/ADC
    dataflow of :func:`operators.llm.pq.ivfpq_topk` reading the stored
    centroid/codebook/codes tables; the corpus itself is never touched.
    Output: ``q_id, nn_id, adist, rank``."""
    centroids = spark.read.parquet(f"{root_path}/centroids")
    codebook = spark.read.parquet(f"{root_path}/pq_codebook")
    codes = spark.read.parquet(f"{root_path}/codes").select(
        F.col(id_col).alias("vid"), "bucket", "m", "code"
    )
    ucent = centroids.select(
        F.col("cid").alias("bucket"),
        F.transform("cv", lambda x: x / F.col("cnrm")).alias("ucv"),
    )
    q = _prepared(queries, id_col, vec_col).select(
        F.col("vid").alias("qid"), "v", "nrm"
    )
    qsim = F.round(
        F.aggregate(
            F.zip_with("v", "cv", lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
        )
        / (F.col("nrm") * F.col("cnrm")),
        ndigits,
    )
    w_probe = Window.partitionBy("qid").orderBy(
        F.col("csim").desc(), F.col("cid").asc()
    )
    probes = (
        q.join(F.broadcast(centroids))
        .withColumn("csim", qsim)
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= nprobe)
        .select(
            "qid",
            F.col("cid").alias("bucket"),
            F.transform("v", lambda x: x / F.col("nrm")).alias("uv"),
        )
    )
    qresid = probes.join(F.broadcast(ucent), "bucket").select(
        "qid", "bucket", F.zip_with("uv", "ucv", lambda a, b: a - b).alias("v")
    )
    d_sub = dim // m if dim else None
    dtable = _subspaces(qresid, m=m).join(F.broadcast(codebook), "m").select(
        "qid",
        "bucket",
        "m",
        F.col("cid").alias("code"),
        _sqdist_fp(F.col("sv"), F.col("cv"), d_sub).alias("d_fp"),
    )
    scored = (
        codes.join(F.broadcast(dtable), ["bucket", "m", "code"])
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


def run_vector_ingest(
    spark: SparkSession,
    *,
    source: DataFrame,
    root_path: str,
    checkpoint_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    available_now: bool = True,
) -> None:
    """Drain an embedding stream into the incremental IVF-PQ index."""
    import hashlib

    app_id = hashlib.md5(checkpoint_path.encode()).hexdigest()[:12]
    writer = (
        source.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(
            lambda batch_df, bid: vector_ingest_batch(
                batch_df,
                root_path,
                id_col=id_col,
                vec_col=vec_col,
                dim=dim,
                batch_id=bid,
                app_id=app_id,
            )
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    query.awaitTermination()
