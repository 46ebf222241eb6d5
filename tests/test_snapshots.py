"""Snapshot layer (``streaming/snapshots.py``): atomic reader-visible
commits over the maintained parquet tables, time travel, vacuum, and
the integration contracts with forget/compact/ingest.

What must hold:
- ``read_snapshot`` serves a complete pinned state — never the mixed
  listing a mid-rewrite directory scan can observe;
- a delete with ``retain_history`` keeps every old version byte-stable
  and readable until vacuum; the default vacuums immediately (REAL
  byte removal — the takedown requirement);
- neither appends nor compaction may resurrect rows that a previous
  delete removed, even while old-version files are still on disk.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from sales_forecast_mlops_at_scale_spark.streaming.forget import (
    _JOURNAL,
    forget_keys,
    heal_forget,
)
from sales_forecast_mlops_at_scale_spark.streaming.snapshots import (
    enable_snapshots,
    heal_dangling_manifest,
    latest_version,
    list_snapshots,
    publish_snapshot,
    read_manifest,
    read_snapshot,
    vacuum_snapshots,
)


def _table(spark, path, n_files=3):
    for lo in range(0, n_files * 10, 10):
        spark.createDataFrame(
            [(i, f"v-{i}") for i in range(lo, lo + 10)], ["k", "v"]
        ).coalesce(1).write.mode("append").parquet(path)


def test_enable_read_and_append_publish(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path)
    assert enable_snapshots(path) == 1
    assert enable_snapshots(path) == 1  # idempotent
    assert read_snapshot(spark, path).count() == 30

    # append new files, publish: version advances, new rows visible
    spark.createDataFrame([(100, "v-100")], ["k", "v"]).coalesce(
        1
    ).write.mode("append").parquet(path)
    assert publish_snapshot(path, op="append") == 2
    assert read_snapshot(spark, path).count() == 31
    assert read_snapshot(spark, path, version=1).count() == 30
    assert [s["op"] for s in list_snapshots(path)] == ["enable", "append"]


def test_forget_default_vacuums_old_versions(spark, tmp_path):
    """The takedown default: after the delete, the erased bytes are
    GONE — no manifest pins them, the superseded files are unlinked,
    and time travel to the pre-delete state is impossible."""
    path = str(tmp_path / "t")
    _table(spark, path)
    enable_snapshots(path)

    stats = forget_keys(spark, path, [5], "k")
    assert stats["rows_deleted"] == 1
    assert latest_version(path) == 2
    assert read_snapshot(spark, path).count() == 29
    assert spark.read.parquet(path).count() == 29  # plain read agrees
    # v1 manifest is gone and its exclusive file is physically removed
    assert not os.path.isfile(
        os.path.join(path, "_snapshots", "v00000001.json")
    )


def test_forget_retain_history_time_travel_then_vacuum(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path)
    enable_snapshots(path)
    files_v1 = set(read_manifest(path)["files"])

    stats = forget_keys(spark, path, [5, 25], "k", retain_history=True)
    assert stats["rows_deleted"] == 2 and latest_version(path) == 2
    # the new version lacks the rows; the OLD version still serves them
    assert {r.k for r in read_snapshot(spark, path).collect()} == (
        set(range(30)) - {5, 25}
    )
    assert read_snapshot(spark, path, version=1).count() == 30
    # every v1 file is still on disk, byte-stable, until the vacuum
    assert all(os.path.isfile(os.path.join(path, f)) for f in files_v1)

    got = vacuum_snapshots(path, keep_last=1)
    assert got["files_removed"] == 2 and got["manifests_removed"] == 1
    assert spark.read.parquet(path).count() == 28  # plain read now clean
    assert {r.k for r in read_snapshot(spark, path).collect()} == (
        set(range(30)) - {5, 25}
    )


def test_append_publish_never_resurrects_retained_files(spark, tmp_path):
    """Scan-mode publish on a versioned table must pin latest+new-only:
    a bare listing would re-include the files only the superseded
    version references, resurrecting deleted rows."""
    path = str(tmp_path / "t")
    _table(spark, path)
    enable_snapshots(path)
    forget_keys(spark, path, [5], "k", retain_history=True)
    assert latest_version(path) == 2

    spark.createDataFrame([(200, "v-200")], ["k", "v"]).coalesce(
        1
    ).write.mode("append").parquet(path)
    publish_snapshot(path, op="append")
    got = {r.k for r in read_snapshot(spark, path).collect()}
    assert got == (set(range(30)) - {5}) | {200}  # 5 stays deleted
    assert read_snapshot(spark, path, version=1).count() == 30


def test_compaction_on_snapshot_table_respects_manifest(spark, tmp_path):
    """Compaction rewrites FROM the manifest: retained old-version
    files on disk must not leak their deleted rows into the compacted
    table; history collapses to the single post-compaction version."""
    from sales_forecast_mlops_at_scale_spark.streaming.compact import (
        compact_parquet_table,
    )

    path = str(tmp_path / "t")
    _table(spark, path)
    enable_snapshots(path)
    forget_keys(spark, path, [5], "k", retain_history=True)

    stats = compact_parquet_table(spark, path, sort_by=["k"])
    assert stats["rows"] == 29  # not 30: the retained v1 file is data,
    # but only the manifest defines the table
    head = latest_version(path)
    assert read_manifest(path, head)["op"] == "compact"
    assert read_snapshot(spark, path).count() == 29
    assert spark.read.parquet(path).count() == 29
    assert len(list_snapshots(path)) == 1  # history collapsed


def test_torn_forget_snapshot_reader_sees_old_complete_state(spark, tmp_path):
    """Crash after the journal landed: LATEST still points at the old
    version, so a snapshot reader sees the complete pre-delete state —
    no mixed listing.  Healing flips the version exactly once."""
    path = str(tmp_path / "t")
    _table(spark, path)
    enable_snapshots(path)
    victim = read_manifest(path)["files"][0]
    dead = {r.k for r in spark.read.parquet(os.path.join(path, victim)).collect()}
    staging = path + ".forget-feedf00d"
    survivors_files: list[str] = []
    os.makedirs(staging)
    with open(os.path.join(path, _JOURNAL), "w", encoding="utf-8") as fh:
        json.dump(
            {
                "staging": staging,
                "add": survivors_files,
                "delete": [victim],
                "defer_deletes": True,
                "op": "forget",
                "run_id": "feedf00d",
                "retain_history": True,  # deferred physical deletion
                "manifest_files": sorted(
                    set(read_manifest(path)["files"]) - {victim}
                ),
            },
            fh,
        )
    # pre-heal: the snapshot reader serves the OLD complete state
    assert read_snapshot(spark, path).count() == 30
    assert latest_version(path) == 1

    assert heal_forget(path) is True
    assert latest_version(path) == 2
    got = {r.k for r in read_snapshot(spark, path).collect()}
    assert got == set(range(30)) - dead
    # deferred delete: the victim file is still on disk until vacuum
    assert os.path.isfile(os.path.join(path, victim))
    vacuum_snapshots(path, keep_last=1)
    assert not os.path.isfile(os.path.join(path, victim))


def test_heal_dangling_manifest_after_compaction_crash(spark, tmp_path):
    """Simulated crash between compaction's dir swap and its publish:
    LATEST references pre-swap names that no longer exist.  The heal
    republishes from the live (verified post-swap) listing."""
    path = str(tmp_path / "t")
    _table(spark, path, n_files=2)
    enable_snapshots(path)
    # simulate the swap: every data file gets a new name
    for f in read_manifest(path)["files"]:
        os.rename(
            os.path.join(path, f), os.path.join(path, f"compacted-{f}")
        )
    assert heal_dangling_manifest(path) is True
    assert read_snapshot(spark, path).count() == 20
    assert heal_dangling_manifest(path) is False  # healthy now


def test_ingest_batch_publishes_snapshot(spark, tmp_path):
    from sales_forecast_mlops_at_scale_spark.streaming.ingest import (
        idempotent_append_batch,
    )

    path = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["store", "productname", "sales"]
    )
    b1.write.parquet(path)  # seed the table, then enable
    enable_snapshots(path)

    b2 = spark.createDataFrame(
        [(2, "b", 99.0), (3, "c", 30.0)], ["store", "productname", "sales"]
    )
    idempotent_append_batch(b2, path, ("store", "productname"))
    assert latest_version(path) == 2
    got = read_snapshot(spark, path)
    assert got.count() == 3  # (2,b) deduped by the anti-join MERGE
    assert {r.store for r in got.collect()} == {1, 2, 3}
    assert read_manifest(path)["op"] == "append"


def test_vacuum_with_wider_keep_after_stronger_vacuum(spark, tmp_path):
    """A keep_last wider than what an earlier keep_last=1 vacuum left
    must not fault on the already-removed manifest slots."""
    path = str(tmp_path / "t")
    _table(spark, path)
    enable_snapshots(path)
    forget_keys(spark, path, [5], "k")       # v2, default vacuum drops v1
    forget_keys(spark, path, [6], "k", retain_history=True)  # v3, v2 kept
    got = vacuum_snapshots(path, keep_last=3)  # window reaches the gap
    assert got["manifests_removed"] == 0      # nothing old enough to drop
    assert read_snapshot(spark, path).count() == 28


def test_unpublished_appends_are_never_lost(spark, tmp_path):
    """A writer that appends WITHOUT publishing must never lose data:
    (1) vacuum only reclaims files the dropped manifests reference —
    never-referenced fresh appends are untouchable; (2) a delete's
    locate scan catch-up-publishes first, so it finds rows in the
    unpublished files; (3) a compaction pins them before its rewrite
    instead of dropping them at the dir swap."""
    from sales_forecast_mlops_at_scale_spark.streaming.compact import (
        compact_parquet_table,
    )

    # (1) vacuum never touches never-referenced files
    p1 = str(tmp_path / "v")
    _table(spark, p1)
    enable_snapshots(p1)
    forget_keys(spark, p1, [5], "k", retain_history=True)  # v2, v1 retained
    spark.createDataFrame([(500, "fresh")], ["k", "v"]).coalesce(
        1
    ).write.mode("append").parquet(p1)  # unpublished append
    got = vacuum_snapshots(p1, keep_last=1)
    assert got["manifests_removed"] == 1
    assert spark.read.parquet(p1).count() == 30  # 29 + the fresh row

    # (2) forget catch-up-publishes, then finds the row in the fresh file
    p2 = str(tmp_path / "f")
    _table(spark, p2)
    enable_snapshots(p2)
    spark.createDataFrame([(500, "fresh")], ["k", "v"]).coalesce(
        1
    ).write.mode("append").parquet(p2)
    stats = forget_keys(spark, p2, [500], "k")
    assert stats["rows_deleted"] == 1
    assert read_snapshot(spark, p2).count() == 30
    assert spark.read.parquet(p2).count() == 30

    # (3) compaction pins the fresh rows before its manifest-scoped rewrite
    p3 = str(tmp_path / "c")
    _table(spark, p3)
    enable_snapshots(p3)
    spark.createDataFrame([(500, "fresh")], ["k", "v"]).coalesce(
        1
    ).write.mode("append").parquet(p3)
    stats = compact_parquet_table(spark, p3, sort_by=["k"])
    assert stats["rows"] == 31
    assert read_snapshot(spark, p3).count() == 31


def test_delete_all_rows_then_maintenance_noops(spark, tmp_path):
    """A retained-history delete of EVERY row leaves a zero-file head
    manifest while old files stay on disk: the table is logically
    empty, and subsequent forget / delete_where / compaction must
    no-op instead of failing schema inference on an empty path list."""
    from sales_forecast_mlops_at_scale_spark.streaming.compact import (
        compact_parquet_table,
    )
    from sales_forecast_mlops_at_scale_spark.streaming.forget import (
        delete_where,
    )

    path = str(tmp_path / "t")
    # partitioned layout: a fully-tombstoned partitionBy staging write
    # emits NO files, which is what produces the zero-file manifest
    spark.createDataFrame(
        [(i, i % 2, f"v{i}") for i in range(20)], ["k", "d", "v"]
    ).repartition("d").write.partitionBy("d").parquet(path)
    enable_snapshots(path)
    stats = forget_keys(
        spark, path, list(range(20)), "k", retain_history=True
    )
    assert stats["rows_deleted"] == 20
    assert read_manifest(path)["files"] == []

    again = forget_keys(spark, path, [5], "k", retain_history=True)
    assert again["rows_deleted"] == 0
    assert delete_where(spark, path, "k > 0")["rows_deleted"] == 0
    c = compact_parquet_table(spark, path, partition_by=["d"])
    assert c["rows"] is None  # logically empty: nothing to compact
    # the old version is still time-travel readable throughout
    assert read_snapshot(spark, path, version=1).count() == 20


def test_marker_hit_redelivery_still_publishes(spark, tmp_path):
    """Crash window between the commit marker and the snapshot publish:
    the redelivered (marker-hit) batch must publish the manifest the
    crashed run never did — even when it is the drain's final batch."""
    from sales_forecast_mlops_at_scale_spark.streaming.ingest import (
        idempotent_append_batch,
    )

    path = str(tmp_path / "t")
    b = spark.createDataFrame([(1, "a", 1.0)], ["store", "productname", "sales"])
    b.write.parquet(path)
    enable_snapshots(path)

    # simulate: batch 7 appended its files and created its marker, but
    # died before publish — the manifest is one batch behind
    b2 = spark.createDataFrame([(2, "b", 2.0)], ["store", "productname", "sales"])
    b2.write.mode("append").parquet(path)
    commits = os.path.join(path, "_commits")
    os.makedirs(commits, exist_ok=True)
    with open(os.path.join(commits, "app-7"), "w") as fh:
        fh.write("")
    assert read_snapshot(spark, path).count() == 1  # stale manifest

    # redelivery of batch 7 hits the marker — and must still publish
    idempotent_append_batch(
        b2, path, ("store", "productname"), batch_id=7, app_id="app"
    )
    assert read_snapshot(spark, path).count() == 2


def test_null_tombstone_keys_are_ignored_not_fatal(spark, tmp_path):
    """A malformed erasure request with NULL ids must not wedge the
    drain: NULLs can never match (SQL IN semantics), so they are
    dropped — mixed lists delete the real keys, all-NULL no-ops."""
    path = str(tmp_path / "t")
    _three = [(i, f"v{i}") for i in range(10)]
    spark.createDataFrame(_three, ["k", "v"]).coalesce(1).write.parquet(path)

    assert forget_keys(spark, path, [None, None], "k")["rows_deleted"] == 0
    stats = forget_keys(spark, path, [None, 5], "k")
    assert stats["rows_deleted"] == 1
    # >1024 values with a None mixed in (the min()/max() range path)
    stats = forget_keys(
        spark, path, [None] + list(range(100, 1300)), "k"
    )
    assert stats["rows_deleted"] == 0  # none of those keys exist
    tomb = spark.createDataFrame([(None,), (7,)], "k long")
    assert forget_keys(spark, path, tomb, "k")["rows_deleted"] == 1
    assert {r.k for r in spark.read.parquet(path).collect()} == (
        set(range(10)) - {5, 7}
    )


def test_refs_index_speeds_publish_and_rebuilds(spark, tmp_path):
    """The REFS index makes publish O(new files); deleting it must be
    harmless (exact rebuild from retained manifests), and the
    resurrect-prevention property must hold either way."""
    path = str(tmp_path / "t")
    _table(spark, path)
    enable_snapshots(path)
    forget_keys(spark, path, [5], "k", retain_history=True)
    refs_file = os.path.join(path, "_snapshots", "REFS.json")
    assert os.path.isfile(refs_file)

    os.unlink(refs_file)  # stale/lost index: rebuild path
    spark.createDataFrame([(300, "x")], ["k", "v"]).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    publish_snapshot(path, op="append")
    got = {r.k for r in read_snapshot(spark, path).collect()}
    assert got == (set(range(30)) - {5}) | {300}  # no resurrection
    assert os.path.isfile(refs_file)  # re-recorded by the publish


def test_stale_journal_temp_is_reaped(spark, tmp_path):
    """A crash between writing the journal temp and its rename leaves
    dot-prefixed garbage inside the table; the next maintenance entry
    must reap it rather than carry it through every future rewrite."""
    from sales_forecast_mlops_at_scale_spark.streaming.forget import (
        _JOURNAL as J,
    )

    path = str(tmp_path / "t")
    _table(spark, path, n_files=1)
    tmp = os.path.join(path, f".{J}.deadbeef")
    with open(tmp, "w") as fh:
        fh.write("{}")
    forget_keys(spark, path, [0], "k")
    assert not os.path.exists(tmp)


def test_dedup_and_vector_ingests_auto_publish_snapshot_tiers(spark, tmp_path):
    """Once a maintained tier is snapshot-enabled, every micro-batch
    publishes it: snapshot readers track the ingest without waiting for
    a maintenance catch-up."""
    from sales_forecast_mlops_at_scale_spark.streaming.dedup_ingest import (
        dedup_ingest_batch,
    )
    from sales_forecast_mlops_at_scale_spark.streaming.vector_ingest import (
        vector_ingest_batch,
    )

    root = str(tmp_path / "corpus")
    b1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),
         (2, "completely different text about shuffle hash joins")],
        "doc_id long, text string",
    )
    dedup_ingest_batch(b1, root)
    enable_snapshots(f"{root}/docs")
    b2 = spark.createDataFrame(
        [(9, "a third, unrelated document about parquet footers")],
        "doc_id long, text string",
    )
    dedup_ingest_batch(b2, root)
    got = read_snapshot(spark, f"{root}/docs")
    assert {r.doc_id for r in got.collect()} == {1, 2, 9}

    vroot = str(tmp_path / "index")

    def vec(seed):
        return [float(((seed * 31 + d * 7) % 1009) - 504) for d in range(64)]

    seed_df = spark.createDataFrame(
        [(i, vec(i)) for i in range(40)], "vec_id long, embedding array<double>"
    )
    vector_ingest_batch(seed_df, vroot, dim=64, batch_id=0)
    enable_snapshots(f"{vroot}/codes")
    more = spark.createDataFrame(
        [(100, vec(100))], "vec_id long, embedding array<double>"
    )
    vector_ingest_batch(more, vroot, dim=64, batch_id=1)
    codes = read_snapshot(spark, f"{vroot}/codes")
    assert codes.where(F.col("vec_id") == 100).count() == 32  # M code rows


def test_clone_snapshot_is_zero_copy_and_isolated(spark, tmp_path):
    """A clone hardlinks the pinned files (same inode — metadata-only
    cost) yet is fully isolated: a surgical delete on the clone leaves
    the source byte-identical, and vice versa."""
    from sales_forecast_mlops_at_scale_spark.streaming.snapshots import (
        clone_snapshot,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "clone")
    _table(spark, src)
    enable_snapshots(src)
    assert clone_snapshot(src, dst) == 1

    # same inodes: the clone cost no data bytes
    m = read_manifest(src)
    assert all(
        os.stat(os.path.join(src, f)).st_ino
        == os.stat(os.path.join(dst, f)).st_ino
        for f in m["files"]
    )
    assert read_snapshot(spark, dst).count() == 30

    # deleting on the CLONE never touches the source
    forget_keys(spark, dst, [5], "k")
    assert read_snapshot(spark, dst).count() == 29
    assert read_snapshot(spark, src).count() == 30
    assert spark.read.parquet(src).count() == 30

    # a second clone into a non-empty dest is refused
    try:
        clone_snapshot(src, dst)
        raise AssertionError("must refuse non-empty destination")
    except FileExistsError:
        pass


def test_concurrent_snapshot_reader_never_sees_mixed_state(spark, tmp_path):
    """The atomicity claim, attacked directly: a reader resolving
    LATEST while a writer loops surgical deletes must only ever observe
    COMPLETE committed states — row counts from the exact committed
    sequence, never a partial/mixed listing."""
    import threading

    path = str(tmp_path / "t")
    _table(spark, path, n_files=4)  # keys 0..39
    enable_snapshots(path)

    legal = {40, 39, 38, 37, 36}  # counts of the committed versions
    seen: set[int] = set()
    illegal: list[int] = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                n = read_snapshot(spark, path).count()
            except Exception:
                continue  # transient JVM-side race on eviction; retry
            if n in legal:
                seen.add(n)
            else:
                illegal.append(n)

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        for k in (3, 13, 23, 33):
            forget_keys(spark, path, [k], "k", retain_history=True)
    finally:
        stop.set()
        t.join(timeout=30)
    assert not illegal, f"reader observed non-committed states: {illegal}"
    assert seen  # the reader actually sampled during the writes
    assert read_snapshot(spark, path).count() == 36


import pytest


@pytest.mark.parametrize("snap", [False, True], ids=["plain", "snapshot"])
def test_crash_point_sweep_every_filesystem_op(spark, tmp_path, monkeypatch, snap):
    """Systematic crash injection: fail the k-th os.rename after the
    journal write begins, for every k until the pass completes clean.
    After each injected crash, the next forget_keys call must heal to a
    correct, journal-free state — the table always equals either the
    pre-delete or the post-delete rows, and the FINAL retry always
    lands the delete.  Runs over BOTH commit protocols: plain journal
    swap, and the snapshot manifest publish riding it (whose
    `_atomic_write` renames add more crash points)."""
    import os as _os

    real_rename = _os.rename
    k = 0
    while True:
        k += 1
        path = str(tmp_path / f"t{k}")
        _table(spark, path, n_files=3)
        if snap:
            enable_snapshots(path)

        calls = {"n": 0}

        def exploding(src, dst, *, _k=k, _calls=calls):
            _calls["n"] += 1
            if _calls["n"] == _k:
                raise OSError(f"injected crash at rename #{_k}")
            real_rename(src, dst)

        monkeypatch.setattr(_os, "rename", exploding)
        crashed = False
        try:
            forget_keys(spark, path, [5, 25], "k")
        except OSError:
            crashed = True
        finally:
            monkeypatch.setattr(_os, "rename", real_rename)

        # whatever the crash point: a retry heals and completes
        stats = forget_keys(spark, path, [5, 25], "k")
        got = {r.k for r in spark.read.parquet(path).collect()}
        assert got == set(range(30)) - {5, 25}, f"crash point {k}: {got}"
        assert stats["rows_deleted"] in (0, 1, 2)
        assert not _os.path.exists(_os.path.join(path, _JOURNAL))
        if snap:
            assert {
                r.k for r in read_snapshot(spark, path).collect()
            } == got, f"crash point {k}: snapshot diverged"
        if not crashed:
            break  # k exceeded the total rename count: clean pass
        assert k < 48, "sweep runaway: rename count grew unexpectedly"
    assert k > 1  # the sweep actually exercised injected crashes


def test_read_snapshot_partitioned_keeps_partition_column(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, i % 2, f"v{i}") for i in range(10)], ["k", "d", "v"]
    ).repartition("d").write.partitionBy("d").parquet(path)
    enable_snapshots(path)
    got = read_snapshot(spark, path)
    assert got.where(F.col("d") == 1).count() == 5
    forget_keys(spark, path, [0], "k")
    assert read_snapshot(spark, path).where(F.col("d") == 0).count() == 4


def test_version_cas_rolls_forward_dangling_commit(spark, tmp_path):
    """A writer that crashed between its manifest CAS and the LATEST
    flip left a complete manifest ahead of the pointer; the next writer
    rolls it forward instead of overwriting or wedging."""
    from sales_forecast_mlops_at_scale_spark.streaming.snapshots import (
        _commit_manifest,
        catchup_publish,
    )

    path = str(tmp_path / "t")
    _table(spark, path)
    enable_snapshots(path)
    m1 = read_manifest(path, 1)
    dangling = {
        "version": 2,
        "parent": 1,
        "op": "forget",
        "run_id": "deadbeef",
        "files": m1["files"][:-1],
    }
    assert _commit_manifest(path, 2, dangling)
    assert latest_version(path) == 1  # flip never happened

    # replaying the crashed run converges idempotently on version 2
    assert (
        publish_snapshot(
            path, op="forget", files=m1["files"][:-1], run_id="deadbeef"
        )
        == 2
    )
    assert latest_version(path) == 2
    assert read_manifest(path, 2)["files"] == sorted(m1["files"][:-1])
    assert catchup_publish(path) in (None, 3)  # healthy afterwards


def test_version_cas_refuses_double_mint(spark, tmp_path):
    from sales_forecast_mlops_at_scale_spark.streaming.snapshots import (
        _commit_manifest,
    )

    path = str(tmp_path / "t")
    _table(spark, path)
    enable_snapshots(path)
    m = {"version": 2, "parent": 1, "op": "x", "run_id": None, "files": []}
    assert _commit_manifest(path, 2, m)
    assert not _commit_manifest(path, 2, m)  # loser detects the race


def test_explicit_files_cas_loss_fails_loudly(spark, tmp_path, monkeypatch):
    """A journaled swap committing an EXPLICIT file list must not
    silently last-writer-win over a concurrent publisher: losing the
    CAS raises instead of retrying with a stale base state."""
    import sales_forecast_mlops_at_scale_spark.streaming.snapshots as sn

    path = str(tmp_path / "t")
    _table(spark, path)
    enable_snapshots(path)
    m1 = read_manifest(path, 1)
    monkeypatch.setattr(sn, "_commit_manifest", lambda *a: False)
    try:
        sn.publish_snapshot(path, op="forget", files=m1["files"][:-1])
        raise AssertionError("expected concurrent-publish RuntimeError")
    except RuntimeError as e:
        assert "concurrent snapshot publish" in str(e)


def test_concurrent_derived_publishers_serialize(spark, tmp_path):
    """Two racing DERIVED publishers (the compaction + takedown-drain
    shape): the CAS serializes them — every version number is minted
    once, no commit is lost, and the final manifest pins all appends."""
    import threading

    path = str(tmp_path / "t")
    _table(spark, path)
    enable_snapshots(path)
    for k in (100, 101):
        spark.createDataFrame([(k, f"v-{k}")], ["k", "v"]).coalesce(
            1
        ).write.mode("append").parquet(path)

    barrier = threading.Barrier(2)
    results, errors = [], []

    def publish():
        try:
            barrier.wait()
            results.append(publish_snapshot(path, op="append"))
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [threading.Thread(target=publish) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    # both publishers committed (same derived content: one mints v2,
    # the other lands on it as a no-change or re-derived publish)
    assert latest_version(path) == max(results) == 2
    assert read_snapshot(spark, path).count() == 32


def test_refs_index_pruned_by_vacuum(spark, tmp_path):
    """REFS.json must stay O(live files), not O(ever-referenced):
    vacuum prunes entries only dropped manifests referenced, and the
    pruned index still classifies fresh unpublished appends correctly."""
    import json as _json

    from sales_forecast_mlops_at_scale_spark.streaming.snapshots import (
        _REFS,
        _SNAPDIR,
        catchup_publish,
    )

    path = str(tmp_path / "t")
    _table(spark, path, n_files=2)
    enable_snapshots(path)
    # a long-lived table: many publish+vacuum generations
    for k in range(5):
        spark.createDataFrame(
            [(1000 + k, "x")], ["k", "v"]
        ).coalesce(1).write.mode("append").parquet(path)
        publish_snapshot(path, op="append")
        vacuum_snapshots(path, keep_last=1)
    refs_path = os.path.join(path, _SNAPDIR, _REFS)
    with open(refs_path, encoding="utf-8") as fh:
        refs = set(_json.load(fh))
    live = set(read_manifest(path)["files"])
    assert refs == live  # pruned exactly to the live file set

    # fresh unpublished append: the pruned index must NOT hide it
    spark.createDataFrame([(9999, "fresh")], ["k", "v"]).coalesce(
        1
    ).write.mode("append").parquet(path)
    assert catchup_publish(path) == latest_version(path)
    assert read_snapshot(spark, path).count() == 2 * 10 + 5 + 1
