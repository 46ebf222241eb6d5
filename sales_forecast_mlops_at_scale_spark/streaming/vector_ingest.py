"""Streaming vector-index ingest — incremental IVF-PQ maintenance, the
embedding twin of :mod:`streaming.dedup_ingest`: every production vector
store ingests embeddings continuously but trains its quantizers rarely.

Tables maintained under ``root_path``:

- ``{root}/vectors``    — raw ``(id, embedding)`` rows (the re-rank tier)
- ``{root}/centroids``  — the coarse quantizer, trained ONCE from the
  first non-empty batch and then FROZEN — faiss's operational model:
  assignment must stay consistent across the index's lifetime;
  retraining is an offline rebuild, not an ingest-path mutation
- ``{root}/pq_codebook`` — residual PQ codebook, same train-once policy
- ``{root}/assignments`` — ``(id, bucket)`` coarse assignments
- ``{root}/codes``      — ``(id, bucket, m, code)`` residual PQ codes,
  the compressed search tier

Every dataflow here is COMPOSED from :mod:`operators.llm.pq`'s shared
pieces (``ivfpq_centroids`` / ``ivfpq_residuals`` /
``ivfpq_train_codebook`` / ``ivfpq_encode`` / ``ivfpq_search``) — the
batch operator ``ivfpq_topk`` and this ingest can therefore never drift
apart on a tie-break or quantization detail.

Per-batch cost is O(batch): one broadcast-join assignment pass and one
broadcast-join encode pass over the batch only — the stored corpus is
never rescanned.  Redelivery is idempotent via the same per-batch commit
marker + per-table anti-join healing protocol as the other ingests
(:func:`streaming.ingest.idempotent_append_batch`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import _plan_key, derived_key
from ..operators.llm.embedsim import _prepared
from ..operators.llm.pq import (
    PQ_K,
    PQ_M,
    ivfpq_centroids,
    ivfpq_encode,
    ivfpq_residuals,
    ivfpq_search,
    ivfpq_train_codebook,
)
from .dedup_ingest import _read_or_none


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
    dedup_threshold: float | None = None,
    dedup_nprobe: int = 4,
    dedup_rerank: int = 50,
) -> None:
    """foreachBatch body: train quantizers on the first non-empty batch,
    then assign + encode ONLY this batch and append all tiers in
    lockstep.

    **Online semantic dedup** (``dedup_threshold``): before appending,
    each batch vector is searched against the COMMITTED index
    (:func:`search_materialized` with the exact re-rank tail — probe
    ``dedup_nprobe`` buckets, re-rank ``dedup_rerank`` ADC candidates by
    exact cosine); a vector whose best committed match scores ≥ the
    threshold is REJECTED — appended to ``{root}/rejected`` as
    ``(id, matched_id, score)`` for audit, never to the index tiers.
    Cost stays O(batch): the search touches integer code rows of probed
    buckets plus Q·R re-rank vectors, never the stored corpus.  Scope:
    the check is batch-vs-CORPUS (the faiss-service shape); near-dups
    arriving together in ONE batch are both admitted — run
    ``embedsim.semantic_dedup`` on the batch first for the stricter
    intra-batch contract."""
    from .ingest import _commit_marker_path

    spark = batch_df.sparkSession
    # an empty batch (restart/commit-only trigger) must NOT train: a
    # frozen 0-row quantizer would silently break the index forever
    # (empty parquet reads back non-None, so training never re-runs)
    if batch_df.isEmpty():
        return
    from .snapshots import publish_enabled_tiers

    def _publish_tiers() -> None:
        # snapshot-enabled tiers get per-batch atomic reader visibility
        # (scan-derived publish; no-op batches mint no version;
        # non-local roots no-op inside the helper)
        publish_enabled_tiers(
            root_path, ("vectors", "assignments", "codes", "rejected")
        )

    fs = marker = None
    if batch_id is not None:
        fs, marker = _commit_marker_path(spark, root_path, f"{app_id}-{batch_id}")
        if fs.exists(marker):
            # redelivery: data committed; heal any marker→publish crash
            _publish_tiers()
            return
    if dedup_threshold is not None and dedup_rerank < 1:
        raise ValueError(
            "dedup_threshold needs dedup_rerank >= 1: the threshold is a "
            "cosine score, which only the exact re-rank tier produces "
            "(rerank=0 returns ADC distances)"
        )
    batch_df = batch_df.dropDuplicates([id_col]).persist()
    # every persisted frame lands here so ONE finally releases them all:
    # a transient append failure must not leak pinned frames into each
    # streaming retry (the accumulation cache.py exists to prevent)
    pins: list[DataFrame] = [batch_df]
    d_sub = dim // m if dim else None

    try:
        _vector_ingest_body(
            spark, batch_df, root_path, pins,
            id_col=id_col, vec_col=vec_col, num_centroids=num_centroids,
            m=m, n_codewords=n_codewords, dim=dim, d_sub=d_sub,
            dedup_threshold=dedup_threshold, dedup_nprobe=dedup_nprobe,
            dedup_rerank=dedup_rerank,
        )
    finally:
        for df in pins:
            df.unpersist()
    if marker is not None:
        fs.createNewFile(marker)  # marker LAST — see ingest.py
    _publish_tiers()


def _vector_ingest_body(
    spark: SparkSession,
    batch_df: DataFrame,
    root_path: str,
    pins: list,
    *,
    id_col: str,
    vec_col: str,
    num_centroids: int,
    m: int,
    n_codewords: int,
    dim: int | None,
    d_sub: int | None,
    dedup_threshold: float | None,
    dedup_nprobe: int,
    dedup_rerank: int,
) -> None:
    """The append work of :func:`vector_ingest_batch`, factored so the
    caller's try/finally releases every frame appended to ``pins`` no
    matter where a write fails."""
    centroids = _read_or_none(spark, f"{root_path}/centroids")
    codebook = _read_or_none(spark, f"{root_path}/pq_codebook")
    if centroids is None or codebook is None:
        c0 = _prepared(batch_df, id_col, vec_col)
        cent = ivfpq_centroids(c0, num_centroids=num_centroids)
        cb = ivfpq_train_codebook(
            ivfpq_residuals(c0, cent),
            m=m,
            n_codewords=n_codewords,
            refine_iters=2,
            d_sub=d_sub,
            # cheap derived key: the deep Lloyd plan must not be
            # traversed per batch (see cache.derived_key)
            key=derived_key(
                _plan_key(c0), "vecingest.cb", num_centroids, m, n_codewords, dim
            ),
        )
        # overwrite (not append): training is a single atomic event; a
        # torn retry rewrites the identical deterministic result
        cent.write.mode("overwrite").parquet(f"{root_path}/centroids")
        cb.write.mode("overwrite").parquet(f"{root_path}/pq_codebook")
        centroids = spark.read.parquet(f"{root_path}/centroids")
        codebook = spark.read.parquet(f"{root_path}/pq_codebook")

    if dedup_threshold is not None:
        existing_vecs = _read_or_none(spark, f"{root_path}/vectors")
        # the CODES tier must exist too: a torn first batch can crash
        # between the vectors and codes appends, and a search against a
        # codes-less index would fail on every replay BEFORE the
        # self-healing anti-join appends run — wedging the stream.  No
        # codes ⇒ no committed searchable corpus ⇒ nothing to dedup
        # against yet; the anti-joins below heal the torn tiers.
        if (
            existing_vecs is not None
            and _read_or_none(spark, f"{root_path}/codes") is not None
        ):
            matches = search_materialized(
                spark,
                root_path,
                batch_df,
                k=1,
                nprobe=dedup_nprobe,
                m=m,
                dim=dim,
                id_col=id_col,
                vec_col=vec_col,
                rerank=dedup_rerank,
            ).filter(
                (F.col("rank") == 1) & (F.col("score") >= dedup_threshold)
            )
            # crash-replay healing: a row already committed to
            # {root}/vectors was ADMITTED on a prior torn attempt (append
            # landed, marker didn't) — on replay its batch-mates now see
            # it in the index, so without this anti-join it could be
            # "rejected" while also present in the index, leaving the
            # audit table disagreeing with the tiers
            rejected = (
                matches.select(
                    F.col("q_id").alias(id_col),
                    F.col("nn_id").alias("matched_id"),
                    "score",
                )
                .join(existing_vecs.select(id_col).distinct(), id_col, "left_anti")
                .persist()
            )
            pins.append(rejected)
            # ONE unconditional append action per batch: redelivery
            # idempotence folds into the same anti-join the index tiers
            # use, and an empty delta write is cheap — no isEmpty() probe
            # and no second read of {root}/rejected afterwards
            existing_rej = _read_or_none(spark, f"{root_path}/rejected")
            delta = rejected
            if existing_rej is not None:
                delta = delta.join(
                    existing_rej.select(id_col).distinct(),
                    id_col,
                    "left_anti",
                )
            # this write materializes `rejected`'s cache (delta's lineage
            # runs the ADC+rerank search exactly once); the admission
            # filter below then joins two cached batch-scale frames
            delta.write.mode("append").parquet(f"{root_path}/rejected")
            batch_df = batch_df.join(
                rejected.select(id_col), id_col, "left_anti"
            )

    # O(batch) passes over THIS batch only; the residual frame feeds the
    # assignments append AND the encode, and codes feeds its own append —
    # pin both so the broadcast-join lineage executes once, not once per
    # downstream action (the appends are separate Spark actions)
    c = _prepared(batch_df, id_col, vec_col)
    resid = ivfpq_residuals(c, centroids).persist()
    pins.append(resid)
    codes = ivfpq_encode(resid, codebook, m=m, d_sub=d_sub).persist()
    pins.append(codes)

    def _append(delta: DataFrame, table: str, key: str) -> None:
        existing = _read_or_none(spark, f"{root_path}/{table}")
        if existing is not None:
            delta = delta.join(
                existing.select(key).distinct(), key, "left_anti"
            )
        delta.write.mode("append").parquet(f"{root_path}/{table}")

    _append(batch_df.select(id_col, vec_col), "vectors", id_col)
    _append(
        resid.select(F.col("vid").alias(id_col), "bucket"), "assignments", id_col
    )
    _append(
        codes.select(F.col("vid").alias(id_col), "bucket", "m", "code"),
        "codes",
        id_col,
    )


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
    rerank: int = 0,
    pin_codes: bool = False,
) -> DataFrame:
    """:func:`operators.llm.pq.ivfpq_search` over the MATERIALIZED index
    tables — the corpus itself is never touched.
    Output: ``q_id, nn_id, adist, rank`` — or, with ``rerank > 0``,
    ``q_id, nn_id, score, rank``: ADC selects top-``rerank`` candidates
    and the ``{root}/vectors`` table (the re-rank tier the ingest
    maintains for exactly this) settles the final order by exact
    cosine.

    The CONSTRUCTED plan is memoized on (codes files, vectors files
    when re-ranking, queries, params) like the in-session tiers
    (:func:`cache.plan_memo`): a serving process answering repeated
    queries pays the py4j expression build once; the file digests
    (size+mtime) key the memo, so an ingest append OR a tier rewrite
    (compaction) misses and rebuilds against the new listing.  The
    stored tiers are NOT persist-pinned by default: materializing a
    cache scans the WHOLE codes table, while the probe filter pushed to
    the parquet scan touches only probed buckets — the O(batch)
    contract the per-micro-batch ingest dedup depends on.  A LONG-LIVED
    SERVING tier should pass ``pin_codes=True``: PQ's design premise is
    that the compressed codes fit in memory (that is what quantization
    buys), so the serving deployment keeps them resident — the pin is
    slot-keyed on the codes file digest, so an ingest append or a
    compaction evicts it."""
    from ..cache import plan_memo

    codes_src = spark.read.parquet(f"{root_path}/codes")
    vectors_src = spark.read.parquet(f"{root_path}/vectors") if rerank else None
    ckey = _plan_key(codes_src)
    vkey = _plan_key(vectors_src) if rerank else "norerank"
    qkey = _plan_key(queries)
    # None on ANY constituent poisons the whole memo key (see
    # pq.pq_adc_topk): the vectors digest must participate when the
    # re-rank branch embeds that tier's file listing, or a
    # vectors-only rewrite (partial compaction) would serve a memoized
    # plan referencing deleted files
    memo_key = (
        derived_key(
            ckey,
            "vecingest.search",
            qkey,
            vkey,
            root_path, k, nprobe, m, dim, id_col, vec_col, ndigits, rerank,
            pin_codes,
        )
        if qkey is not None and vkey is not None
        else None
    )

    def build() -> DataFrame:
        from ..cache import persist_slot

        centroids = spark.read.parquet(f"{root_path}/centroids")
        codebook = spark.read.parquet(f"{root_path}/pq_codebook")
        codes = codes_src.select(
            F.col(id_col).alias("vid"), "bucket", "m", "code"
        )
        if pin_codes:
            codes = persist_slot(
                "vecingest.codes",
                codes,
                key=derived_key(ckey, "codes.pin", id_col) if ckey else None,
            )
        q = _prepared(queries, id_col, vec_col).select(
            F.col("vid").alias("qid"), "v", "nrm"
        )
        vectors = (
            _prepared(vectors_src, id_col, vec_col) if rerank else None
        )
        return ivfpq_search(
            q,
            centroids,
            codebook,
            codes,
            k=k,
            nprobe=nprobe,
            m=m,
            d_sub=dim // m if dim else None,
            ndigits=ndigits,
            vectors=vectors,
            rerank=rerank,
        )

    return plan_memo(memo_key, build, session=spark)


def compact_index_tables(
    spark: SparkSession,
    root_path: str,
    *,
    target_file_bytes: int = 128 << 20,
) -> dict[str, dict]:
    """Maintenance pass over the materialized index: compact every tier
    the ingest appends to (vectors / assignments / codes / rejected) —
    micro-batch ingest fragments them into per-batch part files, and at
    scale the search's scan cost is dominated by file count, not bytes.
    Codes and assignments are range-sorted by ``bucket`` during the
    rewrite so a probe's bucket filter maps to contiguous, min/max-
    prunable files (the search reads ONLY probed buckets — clustering is
    what makes that a file-skip instead of a full listing).  Quantizer
    tables (centroids/codebook) are single-write and never fragment.
    Run between drains, not concurrently with an active ingest (single
    writer, same as any OPTIMIZE).  Returns per-tier stats."""
    import os

    from .compact import compact_parquet_table

    stats: dict[str, dict] = {}
    for table, sort_by in (
        ("vectors", None),
        ("assignments", ["bucket"]),
        ("codes", ["bucket", "m"]),
        ("rejected", None),
    ):
        path = f"{root_path}/{table}"
        if os.path.isdir(path):
            stats[table] = compact_parquet_table(
                spark, path, target_file_bytes=target_file_bytes, sort_by=sort_by
            )
    return stats


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
    dedup_threshold: float | None = None,
) -> None:
    """Drain an embedding stream into the incremental IVF-PQ index.
    ``dedup_threshold`` enables online semantic dedup at ingest (see
    :func:`vector_ingest_batch`)."""
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
                dedup_threshold=dedup_threshold,
            )
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    query.awaitTermination()
