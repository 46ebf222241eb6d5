"""Small-file compaction for the parquet tables the streaming ingests
maintain (``streaming/ingest.py`` / ``dedup_ingest.py`` /
``vector_ingest.py``).

Micro-batch appends are the right write pattern for exactly-once ingest,
but each batch lands at least one part-file per partition — after a day
of 1-minute triggers a table holds thousands of KB-sized files, and at
scale the listing pressure and per-file open cost dominate scan time
(the canonical streaming-sink "small files problem").  Table formats
solve this with OPTIMIZE/rewrite; this is the honest pure-parquet
maximum, in the same spirit as the anti-join MERGE sink:

- rewrite into ``ceil(total_bytes / target_file_bytes)`` files via a
  single ``repartition`` (or a range-partitioned sort when ``sort_by``
  is given — compaction is the natural moment to restore clustering for
  min/max skipping);
- Hive-partitioned tables (``run_stream_ingest``'s date-partitioned
  sales table) MUST pass ``partition_by``: the rewrite then
  repartitions on the partition columns and writes with
  ``partitionBy``, one file per partition value (``target_file_bytes``
  is advisory there).  A partitioned layout with no ``partition_by`` is
  REFUSED — flattening it would corrupt the table for the next
  partitioned append;
- auxiliary entries living inside the table directory (the ``_commits``
  marker manifest, any other ``_``/``.``-prefixed metadata) are copied
  into the staged rewrite BEFORE any destructive step, so no crash
  window can lose commit markers;
- verify the staged copy's ROW COUNT against the source before the
  swap (a failed write aborts with the table untouched);
- swap via two directory renames with a backup in between; the table is
  unavailable for the instant between them (pure parquet has no atomic
  dir replace — readers through :mod:`streaming.snapshots` manifests
  are immune, and compaction republishes post-swap), and every
  crash window is healable: :func:`heal_compaction` restores the backup
  if the swap died in the middle, and stale backups/stagings are
  cleared on the next compaction.

LOCAL FILESYSTEM ONLY: the swap uses ``os.rename``; an ``hdfs://`` or
``s3a://`` root raises instead of silently no-opping (those stores need
the Hadoop FileSystem rename / a table format's commit protocol).
Single writer: run between drains, never concurrently with an active
ingest — the same rule as any OPTIMIZE.  Readers in the same session
must re-open the table after compaction (the file listing changed);
plan-keyed caches (``cache.py``) key on name+size+mtime, so stale
cached frames are evicted, not served.
"""

from __future__ import annotations

import glob
import hashlib
import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def _require_local(path: str) -> str:
    """Validate ``path`` is local and return the plain filesystem path.

    ``file://``-prefixed URIs are accepted — Spark writers emit and
    accept them — but every subsequent call here is ``os``-level, so the
    scheme is STRIPPED rather than passed through (a raw
    ``file:///x/y`` string fed to ``os.walk`` silently lists nothing and
    ``os.rename`` raises a misleading FileNotFoundError — ADVICE r6)."""
    if path.startswith("file://"):
        return path[len("file://") :] or "/"
    if "://" in path:
        raise NotImplementedError(
            "compact_parquet_table swaps directories with os.rename and "
            f"supports local paths only; got {path!r} — use a table "
            "format's OPTIMIZE (or a FileSystem-API port) for remote stores"
        )
    return path


def _data_files(path: str) -> list[str]:
    """All parquet part files, recursively (partitioned tables nest
    them under ``col=value`` directories)."""
    out = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        out += [
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
    return out


def _unlink_data_file(root: str, victim: str) -> bool:
    """Remove one data file plus its Hadoop ``.name.crc`` sidecar, then
    prune any ``col=value`` ancestor dirs the removal emptied (an empty
    partition dir is dead weight for every future listing).  Shared by
    the forget heal and the snapshot vacuum so their on-disk hygiene
    cannot diverge.  Returns True if the data file existed."""
    existed = os.path.isfile(victim)
    if existed:
        os.unlink(victim)
    crc = os.path.join(
        os.path.dirname(victim), f".{os.path.basename(victim)}.crc"
    )
    if os.path.isfile(crc):
        os.unlink(crc)
    d = os.path.dirname(victim)
    while (
        os.path.isdir(d)
        and os.path.realpath(d) != os.path.realpath(root)
        and not os.listdir(d)
    ):
        os.rmdir(d)
        d = os.path.dirname(d)
    return existed


def _partition_dirs(path: str) -> list[str]:
    return [
        d
        for d in os.listdir(path)
        if "=" in d and os.path.isdir(os.path.join(path, d))
    ]


def _aux_entries(path: str) -> list[str]:
    """Non-data entries that must survive a rewrite: the ``_commits``
    marker manifest and any other ``_``/``.``-prefixed metadata, except
    per-write artifacts the new write regenerates (``_SUCCESS``)."""
    return [
        e
        for e in os.listdir(path)
        if e.startswith(("_", ".")) and e != "_SUCCESS"
    ]


def _backup_path(path: str) -> str:
    return path.rstrip("/") + ".pre-compact"


#: Marker file recording the layout signature of the last completed
#: compaction; lives inside the table directory (``_``-prefixed, so data
#: scans skip it and :func:`_aux_entries` carries it through rewrites).
_MARKER = "_compacted"


def _layout_signature(
    path: str,
    target_file_bytes: int,
    sort_by: list[str] | None,
    partition_by: list[str] | None,
) -> str:
    """Digest of the table's current data layout + compaction params.

    Keyed on every data file's relative path, size, and mtime — any
    append, delete, or rewrite changes it — plus the requested output
    shape, so a ``sort_by`` change recompacts even if the files didn't
    move."""
    entries = sorted(
        f"{os.path.relpath(f, path)}#{os.path.getsize(f)}"
        f"#{os.path.getmtime(f)}"
        for f in _data_files(path)
    )
    entries.append(repr((target_file_bytes, sort_by, partition_by)))
    return hashlib.sha256("\n".join(entries).encode()).hexdigest()


def _invalidate_cached_plans(spark: SparkSession, path: str) -> None:
    """A cached plan built over the PRE-rewrite file listing is a
    correctness hazard, not just a staleness one: lazily materialized
    partitions would fault on the deleted files, and already-
    materialized ones would keep serving rows a ``forget`` pass erased.
    ``recacheByPath`` is the exact invalidation Spark itself runs after
    an ``InsertIntoHadoopFsRelation`` commit — every cached plan
    touching ``path`` is dropped and rebuilt over the fresh listing;
    unrelated caches are untouched.  The blunt session-wide
    ``clearCache`` is only the fallback if the internal API ever
    moves."""
    try:
        jss = spark._jsparkSession
        jss.sharedState().cacheManager().recacheByPath(jss, path)
    except Exception:  # noqa: BLE001 — py4j surface change
        spark.catalog.clearCache()


def heal_compaction(path: str) -> bool:
    """Recover from a compaction swap that died between its two renames:
    if the table directory is missing but its backup exists, the backup
    IS the table — restore it.  Returns True if a restore happened.
    Safe to call any time (no-op when the table is healthy)."""
    path = _require_local(path)
    backup = _backup_path(path)
    if not os.path.exists(path) and os.path.isdir(backup):
        os.rename(backup, path)
        return True
    return False


def compact_parquet_table(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 << 20,
    sort_by: list[str] | None = None,
    partition_by: list[str] | None = None,
    transform=None,
) -> dict:
    """Compact the parquet table at ``path`` in place.  Returns a stats
    dict: ``files_before, files_after, bytes, rows`` — the numbers an
    operator alerts on (an already-compact unpartitioned table with no
    ``sort_by`` is a no-op: ``files_after == files_before``, no
    unavailability window).

    Content-preserving by construction (same rows, verified by count
    before the swap) and crash-healable at every step; see the module
    docstring for the exact windows and the partitioned-table contract.
    ``sort_by`` additionally range-partitions + sorts within partitions,
    restoring the min/max clustering that interleaved appends destroy
    (``operators/layout.py`` measures why that matters for scan
    pruning).

    ``transform`` (``DataFrame -> DataFrame``) turns the rewrite into a
    SCHEMA MIGRATION: add-column-with-default, rename, drop, type widen
    — applied to every row while the rewrite is paying for the full
    scan anyway.  Row-preserving by contract: the staged count is
    verified against the PRE-transform count, so a transform that
    filters or explodes rows aborts with the table untouched.  A
    migration always rewrites (the already-compact no-op shortcuts are
    bypassed — they certify layout, not schema).
    """
    path = _require_local(path)
    heal_compaction(path)
    # a torn FORGET swap must heal BEFORE any rewrite: the aux-entry
    # copy below would carry the stale journal through the compaction,
    # and healing it afterwards would move staged survivor files in
    # whose rows the compaction already kept — duplicating them.
    # Local import: forget builds on this module, not vice versa.
    from .forget import heal_forget
    from .snapshots import catchup_publish, heal_dangling_manifest

    heal_forget(path)
    heal_dangling_manifest(path)
    # pin any append that never published — the manifest-scoped rewrite
    # below would otherwise silently DROP those rows at the dir swap
    catchup_publish(path)
    backup = _backup_path(path)
    if os.path.isdir(backup):
        # a previous run crashed AFTER its swap completed but before the
        # backup was deleted — the live table is already the compacted
        # one; the backup is garbage
        shutil.rmtree(backup)
    for stale in glob.glob(f"{path.rstrip('/')}.compact-*"):
        shutil.rmtree(stale, ignore_errors=True)  # single-writer contract

    parts = _partition_dirs(path)
    if parts and not partition_by:
        raise ValueError(
            f"{path!r} is Hive-partitioned ({parts[0]}, ...): pass "
            "partition_by=[...] — rewriting without it would flatten the "
            "layout and corrupt the table for the next partitioned append"
        )

    files = _data_files(path)
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    if transform is None and (
        len(files) <= n_out and not sort_by and not partition_by
    ):
        return {
            "files_before": len(files),
            "files_after": len(files),
            "bytes": total_bytes,
            "rows": None,  # untouched — no scan spent on a no-op
        }
    # sorted/partitioned tiers can't no-op on file count alone (the
    # rewrite also restores clustering), so the last completed
    # compaction leaves a layout-signature marker: unchanged files +
    # unchanged params → the tier is already in its target layout, and
    # a repeat maintenance invocation skips the full rewrite AND the
    # two-rename unavailability window (ADVICE r6)
    signature = _layout_signature(path, target_file_bytes, sort_by, partition_by)
    marker = os.path.join(path, _MARKER)
    if transform is None and os.path.isfile(marker):
        with open(marker, encoding="utf-8") as fh:
            if fh.read().strip() == signature:
                return {
                    "files_before": len(files),
                    "files_after": len(files),
                    "bytes": total_bytes,
                    "rows": None,  # untouched — marker certifies layout
                }
    # snapshot-enabled tables are rewritten FROM THE MANIFEST, not the
    # listing: with retained history the directory legitimately holds
    # files only old versions reference, and a listing-scan rewrite
    # would resurrect their deleted rows into the compacted table
    from .snapshots import snapshots_enabled, table_frame

    df, _rels = table_frame(spark, path)
    if df is None:
        # zero-file manifest: the table is logically empty — nothing to
        # compact, and an empty path list cannot even infer a schema
        return {
            "files_before": len(files),
            "files_after": len(files),
            "bytes": total_bytes,
            "rows": None,
        }
    n_rows = df.count()  # PRE-transform: enforces row-preserving migrations
    if transform is not None:
        df = transform(df)
    if partition_by:
        out = df.repartition(*partition_by)
        if sort_by:
            out = out.sortWithinPartitions(*sort_by)
    elif sort_by:
        out = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        out = df.repartition(n_out)

    staging = f"{path.rstrip('/')}.compact-{uuid.uuid4().hex[:8]}"
    try:
        writer = out.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(staging)
        staged_rows = spark.read.parquet(staging).count()
        if staged_rows != n_rows:
            raise RuntimeError(
                f"compaction row-count mismatch: {staged_rows} != {n_rows}"
            )
        # auxiliary metadata (commit markers) rides along BEFORE any
        # destructive step — a crash anywhere below leaves it present in
        # whichever directory survives
        for entry in _aux_entries(path):
            src = os.path.join(path, entry)
            dst = os.path.join(staging, entry)
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy2(src, dst)
        # the swap: table unavailable only between these two renames
        os.rename(path, backup)
        os.rename(staging, path)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        heal_compaction(path)
        raise
    shutil.rmtree(backup)
    _invalidate_cached_plans(spark, path)
    # stamp the NEW layout so the next maintenance pass can prove the
    # tier is already compact; written after the swap, so a crash here
    # merely forfeits the next no-op (never correctness)
    with open(os.path.join(path, _MARKER), "w", encoding="utf-8") as fh:
        fh.write(
            _layout_signature(path, target_file_bytes, sort_by, partition_by)
        )
    if snapshots_enabled(path):
        # compaction physically rewrites everything, so it COLLAPSES
        # snapshot history by design: pin the post-swap listing as the
        # new (only) version.  A crash between the swap and this
        # publish leaves the LATEST manifest dangling — healed by
        # heal_dangling_manifest at the next maintenance entry.
        from .snapshots import publish_snapshot, vacuum_snapshots

        publish_snapshot(
            path, op="compact" if transform is None else "migrate"
        )
        vacuum_snapshots(path, keep_last=1)
    return {
        "files_before": len(files),
        "files_after": len(_data_files(path)),
        "bytes": total_bytes,
        "rows": n_rows,
    }
