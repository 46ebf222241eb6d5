"""Small-file compaction for the parquet tables the streaming ingests
maintain (``streaming/ingest.py`` / ``dedup_ingest.py`` /
``vector_ingest.py``).

Micro-batch appends are the right write pattern for exactly-once ingest,
but each batch lands at least one part-file per partition — after a day
of 1-minute triggers a table holds thousands of KB-sized files, and at
100 TB the NameNode/listing pressure and per-file open cost dominate
scan time (the canonical streaming-sink "small files problem").  Table
formats solve this with OPTIMIZE/rewrite; this is the honest
pure-parquet maximum, in the same spirit as the anti-join MERGE sink:

- rewrite into ``ceil(total_bytes / target_file_bytes)`` files via a
  single ``repartition`` (or a range-partitioned sort when ``sort_by``
  is given — compaction is the natural moment to restore clustering for
  min/max skipping);
- verify the staged copy's ROW COUNT against the source before any
  destructive step (a failed write aborts with the table untouched);
- swap via two directory renames with a backup in between; the table is
  unavailable for the instant between them (pure parquet has no atomic
  dir replace — a table format is the fix, not more code), and every
  crash window is healable: :func:`heal_compaction` restores the backup
  if the swap died in the middle, and stale backups are cleared on the
  next compaction.

Readers in the same session must re-open the table after compaction
(the file listing changed); plan-keyed caches (``cache.py``) key on
name+size+mtime, so stale cached frames are evicted, not served.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def _part_files(path: str) -> list[str]:
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]


def _backup_path(path: str) -> str:
    return path.rstrip("/") + ".pre-compact"


def heal_compaction(path: str) -> bool:
    """Recover from a compaction swap that died between its two renames:
    if the table directory is missing but its backup exists, the backup
    IS the table — restore it.  Returns True if a restore happened.
    Safe to call any time (no-op when the table is healthy)."""
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
) -> dict:
    """Compact the parquet table at ``path`` in place.  Returns a stats
    dict: ``files_before, files_after, bytes, rows`` — the numbers an
    operator alerts on.

    Content-preserving by construction (same rows, verified by count
    before the swap) and crash-healable at every step; see the module
    docstring for the exact windows.  ``sort_by`` additionally
    range-partitions + sorts within partitions, restoring the min/max
    clustering that interleaved appends destroy (``operators/layout.py``
    measures why that matters for scan pruning).
    """
    heal_compaction(path)
    backup = _backup_path(path)
    if os.path.isdir(backup):
        # a previous run crashed AFTER its swap completed but before the
        # backup was deleted — the live table is already the compacted
        # one; the backup is garbage
        shutil.rmtree(backup)

    files = _part_files(path)
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)
    n_rows = df.count()
    if sort_by:
        out = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        out = df.repartition(n_out)

    staging = f"{path.rstrip('/')}.compact-{uuid.uuid4().hex[:8]}"
    try:
        out.write.mode("overwrite").parquet(staging)
        staged_rows = spark.read.parquet(staging).count()
        if staged_rows != n_rows:
            raise RuntimeError(
                f"compaction row-count mismatch: {staged_rows} != {n_rows}"
            )
        # the swap: table unavailable only between these two renames
        os.rename(path, backup)
        os.rename(staging, path)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        heal_compaction(path)
        raise
    shutil.rmtree(backup)
    return {
        "files_before": len(files),
        "files_after": len(_part_files(path)),
        "bytes": total_bytes,
        "rows": n_rows,
    }
