"""Targeted-key deletion ("right to be forgotten") for the parquet
tables the streaming ingests maintain — the surgical-delete counterpart
of :mod:`streaming.compact`'s OPTIMIZE.

A takedown / GDPR-erasure request arrives as a bounded set of ids; the
table holding them is petabyte-scale.  Rewriting the whole table per
request (the naive ``overwrite`` answer) is O(table); table formats
solve this with deletion vectors / MERGE DELETE that rewrite only the
files containing matched rows.  This is that file-surgical shape in
honest pure parquet:

1. **Locate** — scan the table's ``_metadata.file_path`` semi-joined
   against the broadcast tombstone set: only FILES that actually contain
   a tombstoned row are touched.  A literal prune predicate on the key
   (IN-list / [min,max] range — always a superset of the tombstones)
   rides the scan so parquet footer stats skip row groups and files
   before any row is read; on a table clustered on the key (what
   :func:`streaming.compact.compact_parquet_table`'s ``sort_by``
   restores) the locate pass reads a sliver, not the table.
2. **Rewrite** — read ONLY the affected files, anti-join the tombstones,
   stage the survivors next to the table, and verify
   ``staged == affected_rows − matched_rows`` before anything
   destructive happens (a failed write aborts with the table untouched).
3. **Swap via journal** — a single journal file (atomic rename) records
   exactly which old files die and which staged files move in; then
   staged files are moved in, old files unlinked, journal removed.  A
   crash anywhere after the journal landed is rolled FORWARD by
   :func:`heal_forget` (the staging was already verified complete);
   a crash before it leaves the table untouched and only garbage
   staging behind, cleared on the next run.  Readers between the
   individual file operations may observe a transient mixed listing —
   the same non-atomicity window as compaction's two renames; enable
   :mod:`streaming.snapshots` to close it (the manifest commit rides
   this module's journal, and ``read_snapshot`` then serves a complete
   old or new state, never a mix).

Downstream invariants that make the delete COMPLETE rather than
row-deep:

- derived index tiers are rewritten in the same call
  (:func:`forget_documents` → docs/sets/bands so a forgotten document's
  shingles no longer block future near-dup admissions;
  :func:`forget_vectors` → vectors/assignments/codes/rejected so ANN
  search can never return — or score against — a forgotten vector);
- the ``_compacted`` layout marker self-invalidates (it digests the
  file listing, which just changed), so the next maintenance pass
  re-compacts honestly;
- plan/value memo keys (``cache.py``) and the pinned serving tier
  (``vector_ingest.search_materialized``) key on file digests, so
  stale cached frames are evicted, not served.

The same locate→rewrite→journal core also powers the general
predicate delete (:func:`delete_where` — ``DELETE FROM t WHERE …`` with
three-valued NULL semantics) and the retention sweep
(:func:`expire_older_than` — on time-clustered tables old files die
whole, O(expired), never O(table)).

LOCAL FILESYSTEM ONLY, single writer between drains — the same contract
as :mod:`streaming.compact`.  The tombstone set is broadcast (erasure
requests are bounded by nature); at warehouse scale batch requests and
run one pass per batch, amortizing the locate scan.
"""

from __future__ import annotations

import glob
import json
import math
import os
import shutil
import uuid
from collections.abc import Iterable, Sequence
from itertools import islice
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .compact import (
    _data_files,
    _invalidate_cached_plans,
    _require_local,
    _unlink_data_file,
    heal_compaction,
)

#: Journal filename — ``_``-prefixed so data scans skip it and
#: compaction's aux-entry copy carries an (impossible: single-writer)
#: leftover through a rewrite instead of losing it.
_JOURNAL = "_forget_journal.json"


def _local_path(uri: str) -> str:
    """``input_file_name()`` emits ``file:///x/part...`` URIs; os-level
    surgery needs plain paths."""
    if "://" in uri or uri.startswith("file:/"):
        p = urlparse(uri)
        return p.path or uri
    return uri


def _partition_cols(path: str, files: Sequence[str]) -> list[str]:
    """Ordered Hive partition columns of the table at ``path``, derived
    from the ``col=value`` directory segments of its data-file paths
    (empty for a flat table).  All files of a valid layout share one
    column sequence; a mixed layout is corrupt and refused."""
    seqs = {
        tuple(
            seg.split("=", 1)[0]
            for seg in os.path.relpath(f, path).split(os.sep)[:-1]
            if "=" in seg
        )
        for f in files
    }
    if len(seqs) > 1:
        raise ValueError(
            f"inconsistent partition layout under {path!r}: {sorted(seqs)}"
        )
    return list(seqs.pop()) if seqs else []


#: Driver-memory bound for file-surgical passes: matched file paths are
#: pulled in chunks of this many via ``toLocalIterator`` and each chunk
#: is applied as its own journaled swap, so a broad predicate matching
#: most of a 1M-file table never materializes the full path list on the
#: driver (at 128 MB part files a chunk bounds one pass to ~512 GB of
#: rewrites).  The locate scan's parquet read is the map stage of the
#: ``distinct()`` shuffle, fully materialized before the first chunk is
#: yielded — later chunks read shuffle output, never the (by then
#: partially rewritten) table files.
_AFFECTED_CHUNK_FILES = 4096


def _affected_chunks(scan, chunk_files: int):
    """Yield matched-file-path lists of at most ``chunk_files`` from a
    locate scan without ever holding the full list on the driver."""
    if scan is None:
        return
    it = scan.toLocalIterator()
    while True:
        chunk = [_local_path(r[0]) for r in islice(it, chunk_files)]
        if not chunk:
            return
        yield chunk


def _merge_stats(total: dict, part: dict) -> dict:
    """Accumulate per-chunk surgical-pass stats into a single report."""
    total["files_rewritten"] += part["files_rewritten"]
    total["rows_deleted"] += part["rows_deleted"]
    total["rows_before"] = (total["rows_before"] or 0) + (
        part["rows_before"] or 0
    )
    return total


#: Above this many explicit tombstone values the prune predicate is the
#: [min, max] range instead of the IN-list (Spark itself degrades a wide
#: In source filter to a range at ``parquet.pushdown.inFilterThreshold``;
#: keeping the literal list bounded also keeps the plan string sane).
_INLIST_PRUNE_MAX = 1024


def _table_frame(spark: SparkSession, path: str):
    """Delegates to :func:`streaming.snapshots.table_frame` — manifest-
    scoped on snapshot tables (a directory-scan locate pass would find
    tombstone matches in retained old-version files and resurrect rows
    a previous delete removed), directory listing otherwise.  A
    ``(None, [])`` return means the manifest pins zero files: the
    caller must no-op."""
    from .snapshots import table_frame

    return table_frame(spark, path)


def _locate_scan(spark: SparkSession, path: str, key_col: str, prune, tomb):
    """The locate pass as a DataFrame (exposed for plan audits): files
    containing at least one tombstoned row.

    The semi-join alone would reach the scan as a runtime filter at
    best; ``prune`` is a LITERAL predicate on ``key_col`` (IN-list or
    [min,max] range — always a superset of the tombstone set, so it
    never changes the result), guaranteed to reach the parquet footer.
    Row groups / files whose stats cannot contain a tombstone are
    skipped before any row is read — on a key-clustered table (what
    :func:`streaming.compact.compact_parquet_table`'s ``sort_by``
    restores) the locate pass reads a sliver, not the table.

    The ``_metadata.file_path`` hidden column (not ``input_file_name()``)
    is load-bearing: its scan schema differs from any plain read of the
    table, so Spark can never substitute a plan-keyed CACHED frame here
    (an InMemoryRelation would report empty file names).  Returns
    ``None`` when the table is logically empty (zero-file manifest)."""
    frame, _ = _table_frame(spark, path)
    if frame is None:
        return None
    return (
        frame.select(
            F.col(key_col), F.col("_metadata.file_path").alias("__file")
        )
        .where(prune)
        .join(tomb, key_col, "semi")
        .select("__file")
        .distinct()
    )


def heal_forget(path: str) -> bool:
    """Roll FORWARD a forget whose swap died mid-way: the journal is
    written only after the staged survivors are fully written and
    count-verified, so completing its moves/deletes is always the
    correct direction.  Idempotent; no-op (False) on a healthy table.

    On a snapshot-enabled table the journal additionally carries the
    next manifest's file list: healing publishes it (idempotently, by
    run_id) and DEFERS the physical unlinks to the vacuum — old
    versions stay readable until then."""
    path = _require_local(path)
    journal = os.path.join(path, _JOURNAL)
    if not os.path.isfile(journal):
        return False
    with open(journal, encoding="utf-8") as fh:
        plan = json.load(fh)
    staging = plan["staging"]
    for name in plan["add"]:
        dst = os.path.join(path, name)
        src = os.path.join(staging, name)
        if not os.path.exists(dst) and os.path.isfile(src):
            # partitioned adds nest under col=value dirs that may not
            # exist yet (a rewrite can empty-then-refill a partition)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(src, dst)
    missing = [
        n
        for n in plan["add"]
        if not os.path.isfile(os.path.join(path, n))
    ]
    if missing:
        # a staged survivor exists NOWHERE: completing the journal's
        # deletes would lose its rows.  Refuse loudly — the table is
        # still fully intact (victims untouched), only the journal and
        # staging need operator attention.
        raise RuntimeError(
            f"forget heal cannot complete: staged files {missing} are "
            f"missing from both {path!r} and {staging!r}; victims were "
            "NOT deleted"
        )
    if plan.get("manifest_files") is not None:
        from .snapshots import publish_snapshot

        publish_snapshot(
            path,
            op=plan.get("op", "forget"),
            files=plan["manifest_files"],
            run_id=plan.get("run_id"),
        )
    if plan.get("defer_deletes"):
        shutil.rmtree(staging, ignore_errors=True)
        # vacuum BEFORE the journal unlink: the journal is what carries
        # the caller's physical-erasure intent across crashes — dropped
        # first, a crash here would leave the erased bytes on disk with
        # nothing left to finish the job (replay is safe: moves and
        # publish above are idempotent, vacuum is a no-op second time)
        if not plan.get("retain_history", False):
            from .snapshots import vacuum_snapshots

            vacuum_snapshots(path, keep_last=1)
        os.unlink(journal)
        return True
    for rel in plan["delete"]:
        # adds ran first, so a partition dir this empties was not
        # refilled — _unlink_data_file prunes it with the crc sidecar
        _unlink_data_file(path, os.path.join(path, rel))
    shutil.rmtree(staging, ignore_errors=True)
    os.unlink(journal)
    return True


def _heal_and_prepare(path: str) -> tuple[str, dict]:
    """Shared preamble of every file-surgical delete: heal any torn
    prior swap, clear pre-journal staging garbage (the table was never
    touched by those runs), and build the no-op stats dict."""
    path = _require_local(path)
    # compaction first: it may RESTORE the table directory (mid-swap
    # crash), and a journal inside it can only be seen after the restore
    heal_compaction(path)
    heal_forget(path)
    from .snapshots import catchup_publish, heal_dangling_manifest

    heal_dangling_manifest(path)
    # pin any append that never published — a stale manifest would hide
    # its rows from the locate scan and the delete would miss them
    catchup_publish(path)
    for stale in glob.glob(f"{path.rstrip('/')}.forget-*"):
        shutil.rmtree(stale, ignore_errors=True)
    for tmp in glob.glob(os.path.join(path, f".{_JOURNAL}.*")):
        # a crash between writing the journal temp and its rename left
        # pre-commit garbage the aux-entry copy would otherwise carry
        # through every future compaction
        os.unlink(tmp)
    return path, {
        "files_total": len(_data_files(path)),
        "files_rewritten": 0,
        "rows_deleted": 0,
        "rows_before": None,
    }


def forget_keys(
    spark: SparkSession,
    path: str,
    keys: Iterable | DataFrame,
    key_col: str,
    *,
    target_file_bytes: int = 128 << 20,
    retain_history: bool = False,
    max_files_per_pass: int = _AFFECTED_CHUNK_FILES,
) -> dict:
    """Delete every row of the parquet table at ``path`` whose
    ``key_col`` appears in ``keys``, rewriting ONLY the files that
    contain matches.  Returns stats:
    ``files_total, files_rewritten, rows_deleted, rows_before`` —
    untouched files are bit-identical afterwards (same inode, same
    bytes), which is what keeps an erasure pass O(matched files), not
    O(table).  Matched paths are consumed in ``max_files_per_pass``
    chunks (each its own journaled, crash-healing swap), so even a key
    set touching most of a million-file table stays driver-bounded.

    ``keys`` may be a small iterable of values or a single-column
    DataFrame (its first column is used); either way it is broadcast.

    On a snapshot-enabled table (:mod:`streaming.snapshots`) the delete
    commits a new manifest version atomically; ``retain_history=False``
    (the default — REAL byte removal, the takedown requirement)
    vacuums superseded versions immediately, ``True`` keeps them
    readable via ``read_snapshot`` until a later vacuum.
    """
    path, no_op = _heal_and_prepare(path)
    if not no_op["files_total"]:
        return no_op
    # NULL keys can never match the semi-join (SQL IN semantics), and
    # they poison everything downstream — createDataFrame type
    # inference on an all-None list, min()/max() on a mixed list — so
    # a malformed erasure request must not wedge a checkpointed
    # tombstone drain in a permanent replay loop: drop them here.
    if isinstance(keys, DataFrame):
        tomb = (
            keys.select(F.col(keys.columns[0]).alias(key_col))
            .where(F.col(key_col).isNotNull())
            .distinct()
        )
        lo, hi = tomb.agg(F.min(key_col), F.max(key_col)).first()
        if lo is None:
            return no_op
        prune = F.col(key_col).between(F.lit(lo), F.lit(hi))
    else:
        vals = [v for v in keys if v is not None]
        if not vals:
            return no_op
        tomb = spark.createDataFrame(
            [(v,) for v in vals], [key_col]
        ).distinct()
        if len(vals) <= _INLIST_PRUNE_MAX:
            prune = F.col(key_col).isin(vals)
        else:
            prune = F.col(key_col).between(
                F.lit(min(vals)), F.lit(max(vals))
            )
    tomb = F.broadcast(tomb)

    files_total = no_op["files_total"]
    scan = _locate_scan(spark, path, key_col, prune, tomb)
    stats = no_op
    for affected in _affected_chunks(scan, max_files_per_pass):
        stats = _merge_stats(
            stats,
            _surgical_delete(
                spark,
                path,
                affected,
                lambda hit: (
                    hit.join(tomb, key_col, "semi").count(),
                    hit.join(tomb, key_col, "left_anti"),
                ),
                files_total=files_total,
                target_file_bytes=target_file_bytes,
                op="forget",
                retain_history=retain_history,
            ),
        )
    return stats


def _surgical_delete(
    spark: SparkSession,
    path: str,
    affected: list[str],
    matcher,
    *,
    files_total: int,
    target_file_bytes: int,
    op: str = "forget",
    retain_history: bool = False,
    insert_df: DataFrame | None = None,
    insert_rows: int = 0,
) -> dict:
    """Shared rewrite-and-swap tail of every file-surgical delete:
    read ONLY the affected files, let ``matcher(hit) -> (matched_rows,
    survivors)`` split them, stage + count-verify the survivors, and
    swap via the forward-healing journal.

    ``insert_df`` (the MERGE upsert path) stages additional new rows in
    the SAME staging dir — they ride the same journal moves and the
    same manifest commit, so delete-matched + insert is ONE atomic
    version flip for snapshot readers.

    Hive-partitioned layout: partition VALUES live in the directory
    names, not the files — a bare read of the leaf files would drop
    the partition columns, and flat staged survivors moved into the
    table root would corrupt partition discovery for every future
    read.  ``basePath`` re-attaches the columns; the staged rewrite
    re-emits the col=value layout so journal moves are dir-faithful."""
    pcols = _partition_cols(path, affected)
    reader = spark.read.option("basePath", path) if pcols else spark.read
    hit = reader.parquet(*affected)
    affected_rows = hit.count()
    matched_rows, survivors = matcher(hit)

    run_id = uuid.uuid4().hex[:8]
    # staging is a SIBLING of the table (like compaction's), so no
    # reader listing the table can ever see half-written survivors
    staging = f"{path.rstrip('/')}.forget-{run_id}"
    bytes_affected = sum(os.path.getsize(f) for f in affected)
    n_out = max(1, math.ceil(bytes_affected / target_file_bytes))
    try:
        writer = survivors.repartition(
            min(n_out, len(affected)), *map(F.col, pcols)
        ) if pcols else survivors.repartition(min(n_out, len(affected)))
        w = writer.write.mode("overwrite")
        if pcols:
            w = w.partitionBy(*pcols)
        w.parquet(staging)
        if insert_df is not None:
            wi = insert_df.write.mode("append")
            if pcols:
                wi = wi.partitionBy(*pcols)
            wi.parquet(staging)
        # a fully-tombstoned affected set stages ZERO files (legal: the
        # journal then only deletes) — read.parquet can't infer a schema
        # from an empty dir, so count via the listing in that case
        staged_rows = (
            spark.read.parquet(staging).count()
            if _data_files(staging)
            else 0
        )
        if staged_rows != affected_rows - matched_rows + insert_rows:
            raise RuntimeError(
                f"forget row-count mismatch: staged {staged_rows} != "
                f"{affected_rows} - {matched_rows} + {insert_rows}"
            )
        adds = []
        for root_dir, dirs, files in os.walk(staging):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for f in files:
                if f.endswith(".parquet") and not f.startswith(("_", ".")):
                    # unique final names: a staged part can never collide
                    # with a live file, so the journal's moves are exact
                    final = f"forget-{run_id}-{f}"
                    os.rename(
                        os.path.join(root_dir, f),
                        os.path.join(root_dir, final),
                    )
                    adds.append(
                        os.path.relpath(
                            os.path.join(root_dir, final), staging
                        )
                    )
        plan = {
            "staging": staging,
            "add": adds,
            "delete": [os.path.relpath(f, path) for f in affected],
        }
        from .snapshots import (
            latest_version,
            read_manifest,
            snapshots_enabled,
        )

        if snapshots_enabled(path):
            # the next manifest rides the SAME journal: a crash after
            # the journal lands heals file moves AND the version flip
            # together (publish is run_id-idempotent on replay), and
            # physical unlinks defer to the vacuum so every retained
            # version stays byte-stable until reclaimed
            base = (
                set(read_manifest(path)["files"])
                if latest_version(path)
                else {
                    os.path.relpath(f, path) for f in _data_files(path)
                }
            )
            plan["defer_deletes"] = True
            plan["op"] = op
            plan["run_id"] = run_id
            # the caller's vacuum intent must survive a crash: healing
            # completes the PHYSICAL erasure too, or a takedown whose
            # process died post-journal would leave the bytes on disk
            plan["retain_history"] = retain_history
            plan["manifest_files"] = sorted(
                (base - set(plan["delete"])) | set(adds)
            )
        # journal lands atomically (single-file rename); before it, the
        # table is untouched — after it, heal_forget completes the swap
        tmp = os.path.join(path, f".{_JOURNAL}.{run_id}")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(plan, fh)
        os.rename(tmp, os.path.join(path, _JOURNAL))
    except BaseException:
        # reap the staging ONLY if the journal did not land: once it is
        # on disk, the staging is the journal's source of truth —
        # deleting it would let a later heal unlink the victims without
        # moving the survivors in (silent data loss).  Checked on DISK,
        # not via a flag: the rename syscall can succeed and the call
        # still raise (async exception in the window) — single-writer,
        # and any prior journal was healed at entry, so an existing
        # journal here is necessarily this run's.
        if not os.path.isfile(os.path.join(path, _JOURNAL)):
            shutil.rmtree(staging, ignore_errors=True)
        raise
    # the swap itself IS the forward-heal procedure — including the
    # manifest publish and (per the journal's recorded intent) the
    # physical vacuum, so a crashed run and a live run take ONE path
    heal_forget(path)
    _invalidate_cached_plans(spark, path)
    out = {
        "files_total": files_total,
        "files_rewritten": len(affected),
        "rows_deleted": matched_rows,
        "rows_before": affected_rows,
    }
    if insert_df is not None:
        out["rows_inserted"] = insert_rows
    return out


def delete_where(
    spark: SparkSession,
    path: str,
    condition,
    *,
    target_file_bytes: int = 128 << 20,
    retain_history: bool = False,
    max_files_per_pass: int = _AFFECTED_CHUNK_FILES,
) -> dict:
    """Predicate-based file-surgical delete — the ``MERGE DELETE`` /
    ``DELETE FROM t WHERE …`` analog of :func:`forget_keys`.

    ``condition`` is a Column (or a SQL string passed to ``F.expr``)
    over the table's columns — including Hive partition columns, where
    it becomes pure partition pruning.  Rows where the condition is
    TRUE die; FALSE **and NULL** survive (standard ``DELETE WHERE``
    three-valued semantics).  A simple condition (range, IN, equality)
    pushes into the locate scan's parquet footer stats, so on a table
    clustered on the filtered column only a sliver is read and only
    matching files are rewritten.  A BROAD predicate (matching most of
    the table) is still driver-safe: matched paths stream in
    ``max_files_per_pass`` chunks, each applied as its own journaled
    swap — the full path list never materializes on the driver."""
    if isinstance(condition, str):
        condition = F.expr(condition)
    path, no_op = _heal_and_prepare(path)
    if not no_op["files_total"]:
        return no_op
    frame, _ = _table_frame(spark, path)
    if frame is None:  # zero-file manifest: logically empty table
        return no_op
    scan = (
        frame.where(condition)
        .select(F.col("_metadata.file_path").alias("__file"))
        .distinct()
    )
    stats = no_op
    for affected in _affected_chunks(scan, max_files_per_pass):
        stats = _merge_stats(
            stats,
            _surgical_delete(
                spark,
                path,
                affected,
                lambda hit: (
                    hit.where(condition).count(),
                    # NULL-condition rows SURVIVE a delete (3VL), so the
                    # keep filter is NOT(coalesce(cond, false)), not
                    # plain NOT(cond)
                    hit.where(~F.coalesce(condition, F.lit(False))),
                ),
                files_total=no_op["files_total"],
                target_file_bytes=target_file_bytes,
                op="delete_where",
                retain_history=retain_history,
            ),
        )
    return stats


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    *,
    target_file_bytes: int = 128 << 20,
    retain_history: bool = False,
) -> dict:
    """File-surgical ``MERGE``: every table row whose ``key_cols``
    match an update row is REPLACED by it, unseen keys are INSERTED —
    delete-matched + insert staged together and committed as ONE
    journaled swap.  On a snapshot-enabled table that is a single
    manifest version flip: readers see the pre-merge or the post-merge
    table, never the deleted-but-not-yet-inserted middle.

    Only files containing a matched key are rewritten (located with a
    per-key-column [min,max] prune riding the scan — composite keys
    cannot push an IN-list, but the range box still lets footer stats
    skip files on a key-clustered table).  ``updates`` is deduplicated
    on ``key_cols`` first (last-writer-wins needs an explicit ordering
    upstream; MERGE semantics reject multiple matches).  On a
    partitioned table ``updates`` must carry the partition columns.

    Unlike :func:`delete_where`, the matched-file list here is collected
    whole: it is inherently driver-bounded at O(distinct update keys)
    (each key matches at most a handful of files), and the
    delete-matched + insert pair must land as ONE journaled swap — a
    chunked merge would expose readers to a deleted-but-not-reinserted
    middle state."""
    path, no_op = _heal_and_prepare(path)
    key_cols = list(key_cols)
    updates = updates.dropDuplicates(key_cols)
    insert_rows = updates.count()
    no_op = {**no_op, "rows_inserted": 0}
    if not insert_rows:
        return no_op

    keys = F.broadcast(updates.select(*key_cols).distinct())
    affected: list[str] = []
    if no_op["files_total"]:
        bounds = updates.agg(
            *(
                f(c).alias(f"{tag}_{c}")
                for c in key_cols
                for f, tag in ((F.min, "lo"), (F.max, "hi"))
            )
        ).first()
        clauses = [
            F.col(c).between(
                F.lit(bounds[f"lo_{c}"]), F.lit(bounds[f"hi_{c}"])
            )
            for c in key_cols
            if bounds[f"lo_{c}"] is not None
        ]
        prune = clauses[0] if clauses else F.lit(True)
        for cl in clauses[1:]:
            prune = prune & cl
        frame, _ = _table_frame(spark, path)
        if frame is not None:  # zero-file manifest ⇒ pure insert below
            affected = [
                _local_path(r[0])
                for r in frame.select(
                    *key_cols, F.col("_metadata.file_path").alias("__file")
                )
                .where(prune)
                .join(keys, key_cols, "semi")
                .select("__file")
                .distinct()
                .collect()
            ]
    if not affected:
        # pure insert: nothing to rewrite — plain append, one publish
        pcols = (
            _partition_cols(path, _data_files(path))
            if no_op["files_total"]
            else []
        )
        w = updates.write.mode("append")
        if pcols:
            w = w.partitionBy(*pcols)
        w.parquet(path)
        from .snapshots import publish_snapshot, snapshots_enabled

        if snapshots_enabled(path):
            publish_snapshot(path, op="merge")
        _invalidate_cached_plans(spark, path)
        return {**no_op, "rows_inserted": insert_rows}
    return _surgical_delete(
        spark,
        path,
        affected,
        lambda hit: (
            hit.join(keys, key_cols, "semi").count(),
            hit.join(keys, key_cols, "left_anti"),
        ),
        files_total=no_op["files_total"],
        target_file_bytes=target_file_bytes,
        op="merge",
        retain_history=retain_history,
        insert_df=updates,
        insert_rows=insert_rows,
    )


def expire_older_than(
    spark: SparkSession,
    path: str,
    ts_col: str,
    cutoff,
    *,
    target_file_bytes: int = 128 << 20,
    retain_history: bool = False,
) -> dict:
    """Retention / TTL sweep: delete every row whose ``ts_col`` is
    strictly before ``cutoff`` — the scheduled maintenance twin of the
    on-demand erasure pass.  On a time-partitioned or time-clustered
    table (every streaming-maintained table here — appends arrive in
    time order, and compaction's ``sort_by`` restores clustering) the
    locate scan prunes to the expiring prefix via footer stats /
    partition dirs, old files die whole (zero staged rewrites), and the
    sweep is O(expired data), never O(table)."""
    return delete_where(
        spark,
        path,
        F.col(ts_col) < F.lit(cutoff),
        target_file_bytes=target_file_bytes,
        retain_history=retain_history,
    )


def forget_documents(
    spark: SparkSession,
    root_path: str,
    doc_ids: Iterable,
    *,
    id_col: str = "doc_id",
) -> dict[str, dict]:
    """Erase documents from every tier the dedup ingest maintains
    (:mod:`streaming.dedup_ingest`): ``docs`` (the corpus), ``sets``
    (shingle index), ``bands`` (LSH bucket index).  Removing the index
    rows — not just the text — is what makes the erasure semantically
    complete: a future near-duplicate of a forgotten document is
    ADMITTED, exactly as if the original had never been ingested."""
    doc_ids = list(doc_ids) if not isinstance(doc_ids, DataFrame) else doc_ids
    stats: dict[str, dict] = {}
    for tier in ("docs", "sets", "bands"):
        p = f"{root_path}/{tier}"
        if os.path.isdir(_require_local(p)):
            stats[tier] = forget_keys(spark, p, doc_ids, id_col)
    return stats


def forget_vectors(
    spark: SparkSession,
    root_path: str,
    vec_ids: Iterable,
    *,
    id_col: str = "vec_id",
) -> dict[str, dict]:
    """Erase vectors from every tier the vector ingest maintains
    (:mod:`streaming.vector_ingest`): ``vectors`` (re-rank tier),
    ``assignments``, ``codes`` (the compressed search tier), and the
    ``rejected`` audit log — where a forgotten id is scrubbed whether it
    was the rejected vector OR the retained match it scored against.
    The frozen quantizers (``centroids`` / ``pq_codebook``) hold no
    per-row data and are untouched — faiss's operational model, same as
    ingest.  After the pass, ANN search cannot return a forgotten id
    (its code rows are gone), and the file-digest cache keys evict any
    pinned serving tier built over the old listing."""
    vec_ids = list(vec_ids) if not isinstance(vec_ids, DataFrame) else vec_ids
    stats: dict[str, dict] = {}
    for tier in ("vectors", "assignments", "codes"):
        p = f"{root_path}/{tier}"
        if os.path.isdir(_require_local(p)):
            stats[tier] = forget_keys(spark, p, vec_ids, id_col)
    rej = f"{root_path}/rejected"
    if os.path.isdir(_require_local(rej)):
        stats["rejected"] = forget_keys(spark, rej, vec_ids, id_col)
        matched = forget_keys(spark, rej, vec_ids, "matched_id")
        stats["rejected"]["rows_deleted"] += matched["rows_deleted"]
        stats["rejected"]["files_rewritten"] += matched["files_rewritten"]
    return stats


def run_forget_stream(
    spark: SparkSession,
    *,
    source: DataFrame,
    table_path: str,
    key_col: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> None:
    """Drain a stream of erasure requests into file-surgical deletes —
    the operational takedown shape: tombstone ids arrive on a queue
    (Kafka in production, a file source in tests — the same source
    contract as :func:`streaming.ingest.run_stream_ingest`), and each
    micro-batch is applied as ONE :func:`forget_keys` pass, amortizing
    the locate scan across the whole batch's ids.

    Exactly-once needs no commit manifests here: the delete is
    idempotent (an already-erased key matches no file and no-ops), so
    the at-least-once replay a crashed ``foreachBatch`` gets from the
    checkpoint converges to the same table state.  Blocks until the
    ``availableNow`` drain completes."""

    def _apply(batch_df: DataFrame, _bid: int) -> None:
        # erasure requests are bounded by nature — collect them so the
        # (possibly re-evaluated) streaming batch frame is read exactly
        # once, then run the surgical pass with an explicit value set
        ids = [r[0] for r in batch_df.select(key_col).distinct().collect()]
        forget_keys(spark, table_path, ids, key_col)

    writer = (
        source.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(_apply)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    query.awaitTermination()


def forget_sales_rows(
    spark: SparkSession,
    table_path: str,
    store_ids: Sequence,
    *,
    key_col: str = "store",
) -> dict:
    """Erasure for the domain table :func:`streaming.ingest.run_stream_ingest`
    maintains (reference's rollback/delete path is a SQL ``DELETE`` in
    ``services/data-producer``-adjacent tooling — here it is the same
    file-surgical pass, and Hive partition directories prune the locate
    scan before the footer stats do)."""
    return forget_keys(spark, table_path, store_ids, key_col)
