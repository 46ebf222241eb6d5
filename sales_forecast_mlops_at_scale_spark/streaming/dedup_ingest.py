"""Streaming training-data ingest with near-duplicate filtering — the
composed production pipeline every LLM-data platform runs at the door:

    document stream → exact in-batch dedup → MinHash near-dup filter
    against the EXISTING corpus → append survivors + their index rows

Two tables are maintained side by side:

- ``{root}/docs`` — the accepted documents (the corpus)
- ``{root}/sets`` — their shingle-set index (``doc, sh``), the
  materialized form of :func:`operators.llm.jaccard.shingle_sets`
- ``{root}/bands`` — their LSH band-bucket index (``doc, band, bkey``),
  the materialized form of :func:`operators.llm.minhash.band_rows`

Each micro-batch's near-dup check joins the BATCH's LSH buckets against
the STORED bucket index — the corpus text is never re-shingled (sets
table) and never re-sketched (bands table), so per-batch cost is
O(batch) shingling/hashing + one asymmetric bucket join + exact
verification of candidates (see
:func:`operators.llm.minhash.minhash_incremental_pairs`; at warehouse
scale, partition/bucket the bands table by ``bkey`` so the probe join
prunes its scan as well).  Within-batch
near-dups are resolved by :func:`minhash_lsh_pairs` with a keep-min-id
policy.  At warehouse scale the three appends become one transactional
commit (Delta multi-table txn or a manifest, as in
:mod:`streaming.ingest`); here they share the micro-batch boundary and
the checkpoint makes redelivery idempotent at the batch level.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.llm.jaccard import shingle_sets
from ..operators.llm.minhash import (
    band_rows,
    minhash_incremental_pairs,
    minhash_lsh_pairs,
)


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise


def dedup_ingest_batch(
    batch_df: DataFrame,
    root_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
    batch_id: int | None = None,
    app_id: str = "default",
) -> None:
    """foreachBatch body: filter the batch against the corpus index and
    itself, then append accepted docs and their index rows.

    With ``batch_id`` set, a commit marker under ``{root}/_commits``
    makes a redelivered batch a no-op (same protocol as
    :func:`streaming.ingest.idempotent_append_batch`) — important here
    because the batch performs THREE appends (docs, sets, bands) that
    must not repeat; a torn retry self-heals via each table's anti-join."""
    from .ingest import _commit_marker_path

    spark = batch_df.sparkSession
    # operator-internal caches live in plan-keyed persist slots (one per
    # site, stale plans evicted on the next invocation), so a long
    # stream holds a BOUNDED number of cached frames — no session-global
    # clearCache, which would also wipe caches this module doesn't own
    from .snapshots import publish_enabled_tiers

    def _publish_tiers() -> None:
        # snapshot-enabled tiers get per-batch atomic reader visibility
        # (scan-derived publish — appends only ever ADD files; a no-op
        # batch short-circuits without minting a version; non-local
        # roots no-op inside the helper)
        publish_enabled_tiers(root_path, ("docs", "sets", "bands"))

    # an empty batch (restart/commit-only trigger) must not run the LSH
    # pipeline, three appends, and a marker write — and must not mint
    # empty tier tables whose existence flips the stored-corpus branch
    # for every later batch (the same guard as vector_ingest)
    if batch_df.isEmpty():
        return
    fs = marker = None
    if batch_id is not None:
        fs, marker = _commit_marker_path(spark, root_path, f"{app_id}-{batch_id}")
        if fs.exists(marker):
            # redelivery: data already committed, but a crash in the
            # marker→publish window may have left manifests stale
            _publish_tiers()
            return
    batch_df = batch_df.dropDuplicates([id_col])

    # within-batch near-dups: keep the smallest id of each pair chain
    intra = minhash_lsh_pairs(batch_df, text_col, id_col, n=n, threshold=threshold)
    drop_intra = intra.select(F.col("id_b").alias(id_col)).distinct()
    batch_df = batch_df.join(drop_intra, id_col, "left_anti")

    # cross-corpus near-dups: batch buckets probe the STORED band index
    # ({root}/bands) — the corpus is neither re-shingled (sets table)
    # nor re-sketched (bands table) per batch, so corpus-side work is a
    # bucket-join scan, not O(corpus) hashing
    stored_sets = _read_or_none(spark, f"{root_path}/sets")
    stored_bands = _read_or_none(spark, f"{root_path}/bands")
    if stored_sets is not None:
        corpus_sets = stored_sets.select(F.col(id_col).alias("doc"), "sh")
        if stored_bands is None:
            # backfill for corpora created before the bands table existed
            band_rows(None, text_col, id_col, sets=corpus_sets, n=n).withColumnRenamed(
                "doc", id_col
            ).write.mode("append").parquet(f"{root_path}/bands")
            stored_bands = spark.read.parquet(f"{root_path}/bands")
        cross = minhash_incremental_pairs(
            batch_df,
            corpus_sets=corpus_sets,
            corpus_bands=stored_bands.select(
                F.col(id_col).alias("doc"), "band", "bkey"
            ),
            text_col=text_col,
            id_col=id_col,
            n=n,
            threshold=threshold,
        )
        drop_cross = cross.select(F.col("new_id").alias(id_col)).distinct()
        batch_df = batch_df.join(drop_cross, id_col, "left_anti")

    accepted = batch_df.persist()  # feeds all three appends; tiny (one batch)
    # the shingle stage feeds TWO separate write actions (sets + bands)
    # — unpinned, the regex+HOF shingling would run twice per batch
    accepted_sets = shingle_sets(accepted, text_col, id_col, n=n).persist()
    try:
        # per-table anti-join on id: a torn retry (docs append landed,
        # sets append did not — or vice versa) self-heals by appending
        # ONLY each table's missing rows, so the tables re-enter
        # lockstep without duplicates; the marker then short-circuits
        # clean redeliveries
        docs_existing = _read_or_none(spark, f"{root_path}/docs")
        docs_delta = accepted
        if docs_existing is not None:
            docs_delta = accepted.join(
                docs_existing.select(id_col), id_col, "left_anti"
            )
        docs_delta.write.mode("append").parquet(f"{root_path}/docs")
        sets_delta = accepted_sets.withColumnRenamed("doc", id_col)
        if stored_sets is not None:
            sets_delta = sets_delta.join(
                stored_sets.select(id_col), id_col, "left_anti"
            )
        sets_delta.write.mode("append").parquet(f"{root_path}/sets")
        bands_delta = band_rows(
            None, text_col, id_col, sets=accepted_sets, n=n
        ).withColumnRenamed("doc", id_col)
        if stored_bands is not None:
            bands_delta = bands_delta.join(
                stored_bands.select(id_col).distinct(), id_col, "left_anti"
            )
        bands_delta.write.mode("append").parquet(f"{root_path}/bands")
    finally:
        # released even when an append fails: a streaming retry must
        # not accumulate a pinned pair per attempt
        accepted_sets.unpersist()
        accepted.unpersist()
    if marker is not None:
        fs.createNewFile(marker)  # marker LAST — see ingest.py
    _publish_tiers()


def compact_corpus_tables(
    spark: SparkSession,
    root_path: str,
    *,
    target_file_bytes: int = 128 << 20,
) -> dict[str, dict]:
    """Maintenance pass over the dedup corpus: compact the three
    appended tiers (docs / sets / bands).  ``bands`` is range-sorted by
    ``(band, bkey)`` during the rewrite so an incoming batch's bucket
    probe maps to contiguous min/max-prunable files, and ``sets`` by
    ``sh`` for the verify join — the same clustering-restoration move as
    :func:`vector_ingest.compact_index_tables`.  Single-writer: run
    between drains.  Returns per-tier stats."""
    import os

    from .compact import compact_parquet_table

    stats: dict[str, dict] = {}
    for table, sort_by in (
        ("docs", None),
        ("sets", ["sh"]),
        ("bands", ["band", "bkey"]),
    ):
        path = f"{root_path}/{table}"
        if os.path.isdir(path):
            stats[table] = compact_parquet_table(
                spark, path, target_file_bytes=target_file_bytes, sort_by=sort_by
            )
    return stats


def run_dedup_ingest(
    spark: SparkSession,
    *,
    source: DataFrame,
    root_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    available_now: bool = True,
) -> None:
    """Drain a document stream through the dedup filter into the corpus.

    ``source`` must be a streaming DataFrame with ``id_col`` and
    ``text_col`` columns (parse upstream — e.g. ``parse_json_events``
    for JSON lines)."""
    import hashlib

    app_id = hashlib.md5(checkpoint_path.encode()).hexdigest()[:12]
    writer = (
        source.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(
            lambda batch_df, bid: dedup_ingest_batch(
                batch_df,
                root_path,
                id_col=id_col,
                text_col=text_col,
                threshold=threshold,
                batch_id=bid,
                app_id=app_id,
            )
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    query.awaitTermination()
