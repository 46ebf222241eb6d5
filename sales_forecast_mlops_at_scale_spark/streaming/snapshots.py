"""Minimal snapshot layer for the maintained parquet tables — atomic
reader-visible commits, time travel, and vacuum, in the smallest honest
subset of the Iceberg/Delta commit model this repo needs.

:mod:`streaming.compact` and :mod:`streaming.forget` both document the
same residual window: pure-parquet rewrites mutate a DIRECTORY LISTING,
so a reader listing the table mid-swap can observe a transient mixed
state.  Table formats close it by making readers consume an immutable
MANIFEST instead of the listing; this module is that fix, scoped to the
local-filesystem / single-writer contract the maintenance modules
already hold:

- ``_snapshots/v{N}.json`` — an explicit file list (+ op metadata).
  Parquet part files here are immutable and uniquely named (appends,
  compaction and forget all mint fresh names), so a manifest pins an
  exact byte-stable table state forever.
- ``_snapshots/LATEST`` — the current version number, updated by an
  atomic single-file rename: :func:`read_snapshot` therefore sees the
  previous complete state or the new complete state, NEVER a mix, no
  matter where a writer currently is in its rewrite.
- Time travel = reading an older manifest (the files it references are
  retained until :func:`vacuum_snapshots` reclaims them).
- Physical deletion becomes a VACUUM, exactly as in Delta/Iceberg —
  which is also the honest GDPR story: an erasure pass must be followed
  by (or default to) an immediate vacuum, trading history for actual
  byte removal.

Plain ``spark.read.parquet(path)`` keeps working on a snapshot-enabled
table as long as every writer vacuums to the latest manifest (the
default); a caller that retains history must read through
:func:`read_snapshot`, because the directory listing then legitimately
contains files only OLD versions reference.

LOCAL FILESYSTEM ONLY, single writer between drains — the same contract
as :mod:`streaming.compact` / :mod:`streaming.forget`.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .compact import _data_files, _require_local, _unlink_data_file

_SNAPDIR = "_snapshots"
_LATEST = "LATEST"
#: Incremental index of every file ANY manifest has ever referenced —
#: what makes per-publish cost O(new files) instead of re-parsing every
#: retained manifest (O(versions × files), quadratic over an append-only
#: day of micro-batches).  Ever-referenced is the exact set the
#: ``listing − referenced`` fresh-append derivation needs: a file
#: referenced only by dropped manifests was either deleted by the
#: vacuum or its manifest is still present (vacuum removes files first,
#: manifests last).  Advisory on read — missing/corrupt rebuilds from
#: the retained manifests.
_REFS = "REFS.json"


def _snap_dir(path: str) -> str:
    return os.path.join(path, _SNAPDIR)


def snapshots_enabled(path: str) -> bool:
    return os.path.isdir(_snap_dir(_require_local(path)))


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_snap_dir(path), f"v{version:08d}.json")


def _atomic_write(target: str, payload: str) -> None:
    """Atomic replace via a WRITER-UNIQUE temp name: a shared ``.tmp``
    suffix lets two concurrent pointer writers clobber each other's
    staging file, and the loser's rename then throws FileNotFoundError
    (found by the concurrent-publisher test once _roll_forward started
    re-flipping LATEST under contention)."""
    import threading

    tmp = f"{target}.tmp.{os.getpid()}.{threading.get_ident()}"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(payload)
    os.rename(tmp, target)


def latest_version(path: str) -> int:
    """Current snapshot version (0 = snapshots enabled but nothing
    committed yet; raises if snapshots were never enabled)."""
    path = _require_local(path)
    ptr = os.path.join(_snap_dir(path), _LATEST)
    if not os.path.isfile(ptr):
        if not snapshots_enabled(path):
            raise FileNotFoundError(f"snapshots not enabled under {path!r}")
        return 0
    with open(ptr, encoding="utf-8") as fh:
        return int(fh.read().strip())


def read_manifest(path: str, version: int | None = None) -> dict:
    path = _require_local(path)
    v = latest_version(path) if version is None else version
    with open(_manifest_path(path, v), encoding="utf-8") as fh:
        return json.load(fh)


def _referenced_files(path: str) -> set[str]:
    """Every file any manifest has ever referenced (see ``_REFS``).
    Reads the incremental index when present; otherwise rebuilds
    exactly from the retained manifests (single-writer, so the index
    can only be missing/stale, never wrong for files that still exist
    on disk — a stale index misses only head-manifest files, which the
    derivation re-includes through the ``head ∩ listing`` term)."""
    rp = os.path.join(_snap_dir(path), _REFS)
    if os.path.isfile(rp):
        with open(rp, encoding="utf-8") as fh:
            return set(json.load(fh))
    refs: set[str] = set()
    for v in range(1, latest_version(path) + 1):
        mp = _manifest_path(path, v)
        if os.path.isfile(mp):
            with open(mp, encoding="utf-8") as fh:
                refs |= set(json.load(fh)["files"])
    return refs


def _record_refs(path: str, refs: set[str]) -> None:
    _atomic_write(
        os.path.join(_snap_dir(path), _REFS), json.dumps(sorted(refs))
    )


def _roll_forward(path: str) -> int:
    """Complete any commit that crashed between its manifest CAS and its
    ``LATEST`` flip: a manifest AHEAD of LATEST is always complete (the
    hardlink CAS publishes whole files only), so flipping forward is the
    commit protocol's redo.  Called at every writer entry point; returns
    the (possibly advanced) current version."""
    snap = _snap_dir(path)
    current = latest_version(path)
    while True:
        # advance-only discipline: a concurrent publisher may have
        # flipped LATEST past our stale read, and writing the smaller
        # value would time-travel readers backwards (code-review r8).
        # Re-reading + max NARROWS that window to the instant between
        # this read and our write — it cannot eliminate it without a
        # lock file — and the post-write re-check below guarantees the
        # pointer is monotone BY THE TIME THIS FUNCTION RETURNS, so any
        # regression is transient and repaired by its own causer.
        current = max(current, latest_version(path))
        if os.path.isfile(_manifest_path(path, current + 1)):
            current += 1
            _atomic_write(os.path.join(snap, _LATEST), str(current))
            continue
        live = latest_version(path)
        if live > current:  # our write raced an even newer flip — redo
            current = live
            continue
        return current


def _commit_manifest(path: str, version: int, manifest: dict) -> bool:
    """Exclusive version CAS: stage the manifest fully, then hardlink it
    to ``v{version}.json`` — the link either atomically publishes this
    COMPLETE file or fails with ``FileExistsError`` because another
    writer minted the version first.  No partially-written manifest can
    ever carry the final name.  Returns False when the CAS is lost."""
    target = _manifest_path(path, version)
    tmp = f"{target}.stage.{os.getpid()}.{id(manifest)}"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(json.dumps(manifest))
    try:
        os.link(tmp, target)
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


def publish_snapshot(
    path: str,
    *,
    op: str = "append",
    files: list[str] | None = None,
    run_id: str | None = None,
) -> int:
    """Commit the next snapshot version and atomically flip ``LATEST``.

    ``files`` is the table-relative data-file list the new version pins.
    ``None`` derives it: on a fresh table, the directory listing; on a
    versioned table, the LATEST manifest plus every on-disk file no
    manifest references yet (i.e. new appends) — NEVER a bare listing,
    which under retained history would resurrect files that only old
    versions pin.  Deletes must still pass the explicit survivor list
    (as :func:`streaming.forget` does through its journal).

    Idempotent per ``run_id``: re-publishing the same run (a healed
    crash replay) returns the already-committed version instead of
    minting a duplicate.

    Single-writer is ENFORCED, not just documented: the version number
    is minted by an exclusive hardlink CAS (:func:`_commit_manifest`),
    so two racing publishers can never both own ``v{N+1}`` — the loser
    re-reads the winner's LATEST and retries its derivation, or (when it
    carried an EXPLICIT file list, i.e. a journaled swap whose base
    state the winner just changed) fails loudly rather than silently
    last-writer-winning."""
    path = _require_local(path)
    snap = _snap_dir(path)
    os.makedirs(snap, exist_ok=True)
    files_arg = files
    for _attempt in range(64):
        current = _roll_forward(path)
        if run_id is not None and current:
            head = read_manifest(path, current)
            if head.get("run_id") == run_id:
                return current
        files = files_arg
        if files is None:
            listing = {os.path.relpath(f, path) for f in _data_files(path)}
            if current and op != "heal-compact":
                referenced = _referenced_files(path)
                files = sorted(
                    (set(read_manifest(path, current)["files"]) & listing)
                    | (listing - referenced)
                )
            else:
                # fresh table — or a post-compaction state, where the
                # swap replaced every file and the listing IS the truth
                files = sorted(listing)
        files = sorted(files)
        if current and files == read_manifest(path, current)["files"]:
            # no-change publish (a no-op batch, a redelivered marker-hit
            # replay): minting an identical version would bloat history.
            # Still fold the files into the refs index — a stale index
            # is what got us here, and this is the heal point.
            _record_refs(path, _referenced_files(path) | set(files))
            return current
        version = current + 1
        manifest = {
            "version": version,
            "parent": current,
            "op": op,
            "run_id": run_id,
            "files": files,
        }
        if not _commit_manifest(path, version, manifest):
            # lost the CAS: a concurrent publisher owns this version
            if files_arg is not None:
                raise RuntimeError(
                    f"concurrent snapshot publish detected on {path!r}: "
                    f"version {version} was minted by another writer "
                    "while this journaled swap was committing its "
                    "explicit file list — the base state changed, so "
                    "re-run the maintenance pass instead of overwriting"
                )
            continue  # derived publish: re-derive from the new LATEST
        # the pointer flip IS the commit: readers resolve LATEST first,
        # so they see version N or N+1 in full, never a partial state
        # (a crash between CAS and flip is rolled forward by the next
        # writer's _roll_forward)
        _atomic_write(os.path.join(snap, _LATEST), str(version))
        # refs AFTER the commit: a crash window here leaves the index
        # one version stale, which the derivation tolerates (head ∩
        # listing) and any no-change publish heals
        _record_refs(path, _referenced_files(path) | set(files))
        return version
    raise RuntimeError(
        f"snapshot publish on {path!r} lost the version CAS 64 times — "
        "a runaway concurrent publisher is violating the maintenance "
        "serialization contract"
    )


def table_frame(spark: SparkSession, path: str):
    """The table's current frame + the file set it is scoped to —
    the ONE reader every maintenance rewrite must use.

    Snapshot-enabled tables are read through the LATEST manifest: with
    retained history the directory listing legitimately contains files
    only old versions reference, and a listing-scan rewrite would
    resurrect their deleted rows.  Returns ``(df, manifest_relpaths)``;
    ``(None, [])`` means the manifest pins ZERO files (every row
    deleted, history retained) — the table is logically empty and the
    caller must no-op rather than scan (an empty path list cannot
    infer a schema).  Flat tables return ``(listing_df, None)``."""
    path = _require_local(path)
    if snapshots_enabled(path) and latest_version(path):
        rels = read_manifest(path)["files"]
        if not rels:
            return None, []
        return (
            spark.read.option("basePath", path).parquet(
                *(os.path.join(path, f) for f in rels)
            ),
            rels,
        )
    return spark.read.parquet(path), None


def publish_if_enabled(path: str, *, op: str = "append") -> int | None:
    """Per-batch publish for a single table IF snapshots are enabled on
    it — scheme-agnostic: a non-local path (where snapshots cannot
    exist) is a silent no-op, so remote-store ingests keep working.
    Every ingest's per-batch publish goes through here so the guard
    cannot be forgotten at a call site."""
    try:
        enabled = snapshots_enabled(path)
    except NotImplementedError:
        return None  # non-local: snapshots are local-FS only
    return publish_snapshot(path, op=op) if enabled else None


def publish_enabled_tiers(
    root_path: str, tiers, *, op: str = "append"
) -> None:
    """:func:`publish_if_enabled` over every tier under ``root_path``."""
    for tier in tiers:
        publish_if_enabled(f"{root_path}/{tier}", op=op)


def enable_snapshots(path: str) -> int:
    """Turn the table at ``path`` into a snapshot-tracked table, pinning
    its current listing as version 1.  No-op (returns the current
    version) if already enabled."""
    path = _require_local(path)
    if snapshots_enabled(path) and latest_version(path):
        return latest_version(path)
    return publish_snapshot(path, op="enable")


def list_snapshots(path: str) -> list[dict]:
    """All RETAINED manifests, oldest first (op + file count, not the
    full file lists) — vacuumed versions are gone by design."""
    path = _require_local(path)
    out = []
    for v in range(1, latest_version(path) + 1):
        if not os.path.isfile(_manifest_path(path, v)):
            continue
        m = read_manifest(path, v)
        out.append(
            {
                "version": m["version"],
                "op": m["op"],
                "files": len(m["files"]),
                "parent": m["parent"],
            }
        )
    return out


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """The table exactly as pinned by ``version`` (default: latest) —
    immune to concurrent rewrites' transient listing states, and the
    time-travel read for retained history.  ``basePath`` keeps Hive
    partition columns attached for partitioned layouts."""
    path = _require_local(path)
    m = read_manifest(path, version)
    if not m["files"]:
        raise ValueError(
            f"snapshot v{m['version']} of {path!r} pins zero files"
        )
    return spark.read.option("basePath", path).parquet(
        *(os.path.join(path, f) for f in m["files"])
    )


def clone_snapshot(path: str, dest: str, *, version: int | None = None) -> int:
    """Zero-copy clone of a pinned version into a fresh table at
    ``dest`` (the dev/test-sandbox pattern): every data file is
    HARDLINKED, so a 100 TB clone costs metadata only.  Safe because
    part files here are immutable — writers always mint new names, and
    deletes unlink (the other table's link keeps its bytes alive).
    The clone starts its own snapshot history at version 1."""
    path = _require_local(path)
    dest = _require_local(dest)
    if os.path.exists(dest) and (
        not os.path.isdir(dest) or os.listdir(dest)
    ):
        raise FileExistsError(f"clone destination {dest!r} is not empty")
    m = read_manifest(path, version)
    for rel in m["files"]:
        dst = os.path.join(dest, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.link(os.path.join(path, rel), dst)
    return publish_snapshot(dest, op="clone")


def catchup_publish(path: str) -> int | None:
    """Pin any not-yet-published appends (files NO manifest references)
    into a fresh version — the safety valve for writers that appended
    without publishing.  Maintenance entry points call this before any
    manifest-scoped read, so an unpublished append can never be missed
    by a delete's locate scan or dropped by a compaction rewrite.
    Returns the new version, or None if the table was current."""
    path = _require_local(path)
    if not snapshots_enabled(path) or not latest_version(path):
        return None
    _roll_forward(path)
    current = set(read_manifest(path)["files"])
    referenced = _referenced_files(path)
    listing = {os.path.relpath(f, path) for f in _data_files(path)}
    fresh = listing - referenced
    if not fresh:
        return None
    return publish_snapshot(
        path, op="append", files=sorted((current & listing) | fresh)
    )


def heal_dangling_manifest(path: str) -> bool:
    """Recover a snapshot table whose compaction crashed between its
    dir swap and its publish: the LATEST manifest then references
    pre-swap files that no longer exist.  The live listing IS the
    correct post-swap state (the swap's row count was verified), so
    republish from it.  Idempotent; False on a healthy table."""
    path = _require_local(path)
    if not snapshots_enabled(path) or not latest_version(path):
        return False
    _roll_forward(path)
    m = read_manifest(path)
    if all(os.path.isfile(os.path.join(path, f)) for f in m["files"]):
        return False
    publish_snapshot(path, op="heal-compact")
    vacuum_snapshots(path, keep_last=1)
    return True


def vacuum_snapshots(path: str, *, keep_last: int = 1) -> dict:
    """Physically reclaim files no kept manifest references and drop the
    expired manifests.  ``keep_last=1`` (the default everywhere a delete
    wants REAL byte removal — the GDPR requirement) leaves only the
    current version; larger values retain that much time travel.

    Reclaims ONLY files the dropped manifests reference (minus any the
    kept manifests still pin): a file referenced by NO manifest is a
    not-yet-published append — deleting it would destroy fresh data, so
    vacuum never touches it (and reads through :func:`read_snapshot`
    of any surviving version stay byte-stable)."""
    path = _require_local(path)
    head = latest_version(path)
    if not head:
        return {"files_removed": 0, "manifests_removed": 0}
    head = _roll_forward(path)
    keep_from = max(1, head - max(1, keep_last) + 1)
    pinned: set[str] = set()
    for v in range(keep_from, head + 1):
        # a kept slot can already be gone: an earlier STRONGER vacuum
        # (smaller keep_last) legitimately removed it
        if os.path.isfile(_manifest_path(path, v)):
            pinned |= set(read_manifest(path, v)["files"])
    droppable: set[str] = set()
    drop_versions = [
        v
        for v in range(1, keep_from)
        if os.path.isfile(_manifest_path(path, v))
    ]
    for v in drop_versions:
        droppable |= set(read_manifest(path, v)["files"])
    removed = 0
    for rel in sorted(droppable - pinned):
        if _unlink_data_file(path, os.path.join(path, rel)):
            removed += 1
    # files first, manifests last: a crash mid-vacuum re-derives the
    # drop set from the still-present manifests on the next run
    manifests_removed = 0
    for v in drop_versions:
        os.unlink(_manifest_path(path, v))
        manifests_removed += 1
    if manifests_removed:
        # prune the ever-referenced index down to what can still matter:
        # without this the per-publish REFS rewrite grows O(total
        # history) on a long-lived streaming table — quadratic JSON IO
        # over its lifetime.  A file referenced only by the manifests
        # just dropped is either deleted above (gone from the listing —
        # irrelevant to the `listing − referenced` derivation) or pinned
        # by a kept manifest; keeping `(old ∪ droppable) ∩ listing ∪
        # pinned` therefore preserves the derivation exactly while
        # bounding the index at O(live files).
        listing_after = {
            os.path.relpath(f, path) for f in _data_files(path)
        }
        _record_refs(
            path,
            ((_referenced_files(path) | droppable) & listing_after)
            | pinned,
        )
    return {"files_removed": removed, "manifests_removed": manifests_removed}
