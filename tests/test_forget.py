"""Targeted-key deletion (``streaming/forget.py``): file-surgical
erasure across the maintained parquet tiers.

What must hold:
- only files containing a tombstoned row are rewritten — every other
  file stays BIT-IDENTICAL (same name, size, mtime), which is the whole
  point of the operator at 100 TB;
- the journaled swap heals forward from any post-journal crash;
- tier-level erasure is semantically complete: a forgotten document's
  index rows no longer block a future near-duplicate, and a forgotten
  vector can never be returned by ANN search again.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import functions as F

from sales_forecast_mlops_at_scale_spark.streaming.forget import (
    _JOURNAL,
    forget_documents,
    forget_keys,
    forget_vectors,
    heal_forget,
)


def _file_states(path):
    out = {}
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                out[os.path.relpath(p, path)] = (st.st_size, st.st_mtime_ns)
    return out


def _three_file_table(spark, path):
    """Three known part files: keys 0-9 / 10-19 / 20-29, one file each."""
    for lo in (0, 10, 20):
        spark.createDataFrame(
            [(i, f"payload-{i}") for i in range(lo, lo + 10)], ["k", "v"]
        ).coalesce(1).write.mode("append").parquet(path)
    assert len(_file_states(path)) == 3


def test_forget_keys_rewrites_only_matched_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _three_file_table(spark, path)
    before = _file_states(path)

    stats = forget_keys(spark, path, [3, 7], "k")
    assert stats == {
        "files_total": 3,
        "files_rewritten": 1,
        "rows_deleted": 2,
        "rows_before": 10,
    }
    got = spark.read.parquet(path)
    assert got.count() == 28
    assert {r.k for r in got.collect()} == set(range(30)) - {3, 7}
    # untouched files are bit-identical; exactly one old file is gone
    after = _file_states(path)
    kept = set(before) & set(after)
    assert len(kept) == 2
    assert all(before[f] == after[f] for f in kept)
    assert all(f.startswith("forget-") for f in set(after) - set(before))
    assert not os.path.exists(os.path.join(path, _JOURNAL))


def test_forget_keys_accepts_dataframe_and_noops_on_miss(spark, tmp_path):
    path = str(tmp_path / "t")
    _three_file_table(spark, path)
    before = _file_states(path)

    miss = forget_keys(spark, path, [999, -1], "k")
    assert miss["files_rewritten"] == 0 and miss["rows_deleted"] == 0
    assert _file_states(path) == before  # literally nothing moved

    tomb = spark.createDataFrame([(25,), (25,), (26,)], ["any_name"])
    hit = forget_keys(spark, path, tomb, "k")
    assert hit["rows_deleted"] == 2 and hit["files_rewritten"] == 1
    assert spark.read.parquet(path).count() == 28

    empty = forget_keys(spark, path, [], "k")
    assert empty["rows_deleted"] == 0


def test_heal_forget_completes_interrupted_swap(spark, tmp_path):
    """Crash after the journal landed but before any file moved: the
    next touch (heal_forget directly, or any forget_keys call) must
    roll the swap FORWARD to the verified staged state."""
    path = str(tmp_path / "t")
    _three_file_table(spark, path)
    victim = next(
        f for f in _file_states(path) if any(
            r.k == 5 for r in spark.read.parquet(os.path.join(path, f)).collect()
        )
    )
    # stage the survivors of the victim file by hand, exactly as
    # forget_keys would have left them at the crash point
    staging = path + ".forget-deadbeef"
    survivors = spark.read.parquet(os.path.join(path, victim)).where(
        F.col("k") != 5
    )
    survivors.coalesce(1).write.parquet(staging)
    staged = [
        f for f in os.listdir(staging)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    adds = []
    for f in staged:
        final = f"forget-deadbeef-{f}"
        os.rename(os.path.join(staging, f), os.path.join(staging, final))
        adds.append(final)
    with open(os.path.join(path, _JOURNAL), "w", encoding="utf-8") as fh:
        json.dump({"staging": staging, "add": adds, "delete": [victim]}, fh)

    assert heal_forget(path) is True
    got = spark.read.parquet(path)
    assert got.count() == 29
    assert {r.k for r in got.collect()} == set(range(30)) - {5}
    assert not os.path.exists(staging)
    assert not os.path.exists(os.path.join(path, _JOURNAL))
    assert heal_forget(path) is False  # idempotent: healthy table no-ops


def test_heal_forget_is_idempotent_mid_crash(spark, tmp_path):
    """A crash DURING healing (some moves done, some not) heals cleanly
    on the retry — every journal step is individually idempotent."""
    path = str(tmp_path / "t")
    _three_file_table(spark, path)
    victim = sorted(_file_states(path))[0]
    staging = path + ".forget-cafe0001"
    os.makedirs(staging)
    # empty survivor set: the whole victim file is tombstoned
    with open(os.path.join(path, _JOURNAL), "w", encoding="utf-8") as fh:
        json.dump({"staging": staging, "add": [], "delete": [victim]}, fh)
    # simulate a half-heal: victim already unlinked, journal remains
    os.unlink(os.path.join(path, victim))
    assert heal_forget(path) is True
    assert spark.read.parquet(path).count() == 20
    assert not os.path.exists(os.path.join(path, _JOURNAL))


def test_locate_scan_pushes_literal_prune_to_parquet(spark, tmp_path):
    """The locate pass must push a LITERAL key predicate into the
    parquet scan (footer-stats file/row-group skipping) — the semi-join
    alone reaches the scan as a runtime filter at best, and at 100 TB
    the difference is reading a sliver of a sorted table vs all of it.
    Covers both prune shapes: IN-list (small explicit sets) and
    [min,max] range (DataFrame tombstones)."""
    from sales_forecast_mlops_at_scale_spark.streaming.forget import (
        _locate_scan,
    )

    path = str(tmp_path / "t")
    _three_file_table(spark, path)

    def executed(df):
        df.count()
        return df._jdf.queryExecution().executedPlan().toString()

    tomb = F.broadcast(
        spark.createDataFrame([(3,), (7,)], ["k"]).distinct()
    )
    plan = executed(
        _locate_scan(spark, path, "k", F.col("k").isin([3, 7]), tomb)
    )
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "In(k" in pushed, plan

    plan = executed(
        _locate_scan(
            spark, path, "k",
            F.col("k").between(F.lit(3), F.lit(7)), tomb,
        )
    )
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "GreaterThanOrEqual(k" in pushed and "LessThanOrEqual(k" in pushed, plan


def test_forget_keys_dataframe_tombstones_use_range_prune(spark, tmp_path):
    """End-to-end through forget_keys with DataFrame tombstones (the
    [min,max] prune path): result identical to the explicit-list path,
    empty tombstone frame no-ops without touching the table."""
    path = str(tmp_path / "t")
    _three_file_table(spark, path)
    before = _file_states(path)

    empty = spark.createDataFrame([], "k long")
    stats = forget_keys(spark, path, empty, "k")
    assert stats["files_rewritten"] == 0 and stats["rows_deleted"] == 0
    assert _file_states(path) == before

    tomb = spark.createDataFrame([(3,), (27,)], ["k"])
    stats = forget_keys(spark, path, tomb, "k")
    assert stats["rows_deleted"] == 2 and stats["files_rewritten"] == 2
    assert {r.k for r in spark.read.parquet(path).collect()} == (
        set(range(30)) - {3, 27}
    )


def _partitioned_table(spark, path):
    """Hive layout: d=0..2 partition dirs, keys 0-9 / 10-19 / 20-29."""
    for d in (0, 1, 2):
        spark.createDataFrame(
            [(i, d, f"payload-{i}") for i in range(d * 10, d * 10 + 10)],
            ["k", "d", "v"],
        ).coalesce(1).write.mode("append").partitionBy("d").parquet(path)
    assert len(_file_states(path)) == 3


def test_forget_keys_preserves_hive_partitioned_layout(spark, tmp_path):
    """Partition VALUES live in directory names: the rewrite must
    re-attach them (basePath), stage survivors back under their
    col=value dirs, and leave untouched partitions bit-identical — a
    flat rewrite would corrupt partition discovery for every future
    read of the table."""
    path = str(tmp_path / "t")
    _partitioned_table(spark, path)
    before = _file_states(path)

    stats = forget_keys(spark, path, [13, 17], "k")
    assert stats["files_rewritten"] == 1 and stats["rows_deleted"] == 2
    got = spark.read.parquet(path)
    assert {r.k for r in got.collect()} == set(range(30)) - {13, 17}
    # the partition column survives the rewrite with its dir-encoded value
    assert {(r.k, r.d) for r in got.where(F.col("d") == 1).collect()} == {
        (k, 1) for k in range(10, 20) if k not in (13, 17)
    }
    after = _file_states(path)
    kept = set(before) & set(after)
    assert len(kept) == 2
    assert all(before[f] == after[f] for f in kept)
    # every new file landed INSIDE its partition dir, none at the root
    new = set(after) - set(before)
    assert new and all(f.startswith("d=1/") or f.startswith("d=1" + os.sep) for f in new)


def test_forget_whole_partition_drains_and_prunes_dir(spark, tmp_path):
    """Tombstoning on the partition column itself: every row of the
    affected files dies, zero files are staged (legal — the journal
    only deletes), and the emptied col=value dir is removed rather
    than left to pollute future listings."""
    path = str(tmp_path / "t")
    _partitioned_table(spark, path)

    stats = forget_keys(spark, path, [2], "d")
    assert stats == {
        "files_total": 3,
        "files_rewritten": 1,
        "rows_deleted": 10,
        "rows_before": 10,
    }
    assert not os.path.exists(os.path.join(path, "d=2"))
    got = spark.read.parquet(path)
    assert got.count() == 20
    assert {r.d for r in got.select("d").distinct().collect()} == {0, 1}


def test_forget_sales_rows_on_partitioned_domain_table(spark, tmp_path):
    """The domain wrapper end-to-end: erase two stores from a
    date-partitioned sales table; every partition keeps its other
    stores, layout intact."""
    from sales_forecast_mlops_at_scale_spark.streaming.forget import (
        forget_sales_rows,
    )

    path = str(tmp_path / "sales")
    rows = [
        (s, f"2023-01-0{d}", float(s * 10 + d))
        for s in range(1, 6)
        for d in (1, 2, 3)
    ]
    spark.createDataFrame(rows, ["store", "sale_date", "sales"]).repartition(
        "sale_date"
    ).write.partitionBy("sale_date").parquet(path)

    stats = forget_sales_rows(spark, path, [2, 4])
    assert stats["rows_deleted"] == 6  # 2 stores x 3 dates
    got = spark.read.parquet(path)
    assert {r.store for r in got.collect()} == {1, 3, 5}
    assert got.select("sale_date").distinct().count() == 3


def test_delete_where_predicate_and_null_semantics(spark, tmp_path):
    """DELETE WHERE three-valued logic: TRUE rows die, FALSE **and
    NULL** rows survive; only files containing a TRUE row are
    rewritten."""
    from sales_forecast_mlops_at_scale_spark.streaming.forget import (
        delete_where,
    )

    path = str(tmp_path / "t")
    # file A: scores 1..5, file B: scores 100..104, file C: all NULL
    spark.createDataFrame(
        [(i, i) for i in range(1, 6)], "k long, score long"
    ).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(i, 100 + i) for i in range(5)], "k long, score long"
    ).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(i, None) for i in range(50, 53)], "k long, score long"
    ).coalesce(1).write.mode("append").parquet(path)
    before = _file_states(path)

    stats = delete_where(spark, path, "score < 10")
    assert stats["rows_deleted"] == 5 and stats["files_rewritten"] == 1
    got = spark.read.parquet(path)
    assert got.count() == 8  # 5 high scores + 3 NULLs all survive
    assert got.where(F.col("score").isNull()).count() == 3
    # the NULL file and the high-score file were never touched
    after = _file_states(path)
    kept = set(before) & set(after)
    assert len(kept) == 2 and all(before[f] == after[f] for f in kept)

    # Column-object condition, zero matches: nothing moves
    miss = delete_where(spark, path, F.col("score") > 10_000)
    assert miss["files_rewritten"] == 0
    assert _file_states(path) == after


def test_expire_older_than_drops_old_files_whole(spark, tmp_path):
    """Retention sweep on a time-clustered table: fully-expired files
    die whole (no staged rewrite), the boundary file is rewritten, new
    data is untouched."""
    import datetime

    from sales_forecast_mlops_at_scale_spark.streaming.forget import (
        expire_older_than,
    )

    path = str(tmp_path / "t")
    day = datetime.date
    for lo, hi in ((1, 5), (6, 10), (11, 15)):
        spark.createDataFrame(
            [(i, day(2023, 1, i)) for i in range(lo, hi + 1)],
            "k long, ts date",
        ).coalesce(1).write.mode("append").parquet(path)

    stats = expire_older_than(spark, path, "ts", day(2023, 1, 8))
    # files 1-5 (all expired) and 6-10 (boundary) touched; 11-15 not
    assert stats["files_rewritten"] == 2 and stats["rows_deleted"] == 7
    got = spark.read.parquet(path)
    assert {r.k for r in got.collect()} == set(range(8, 16))

    # idempotent: a second sweep at the same cutoff is a pure no-op
    again = expire_older_than(spark, path, "ts", day(2023, 1, 8))
    assert again["files_rewritten"] == 0 and again["rows_deleted"] == 0


def test_delete_where_on_partition_column_prunes_whole_partition(spark, tmp_path):
    from sales_forecast_mlops_at_scale_spark.streaming.forget import (
        delete_where,
    )

    path = str(tmp_path / "t")
    _partitioned_table(spark, path)
    stats = delete_where(spark, path, "d = 0")
    assert stats["files_rewritten"] == 1 and stats["rows_deleted"] == 10
    assert not os.path.exists(os.path.join(path, "d=0"))
    assert spark.read.parquet(path).count() == 20


def test_forget_documents_unblocks_future_near_dups(spark, tmp_path):
    """Erasure is semantically complete: once a document's corpus row
    AND index rows are gone, a near-duplicate of it is admitted by the
    next ingest batch — as if the original had never existed."""
    from sales_forecast_mlops_at_scale_spark.streaming.dedup_ingest import (
        dedup_ingest_batch,
    )

    root = str(tmp_path / "corpus")
    alpha = "the quick brown fox jumps over the lazy dog again and again tonight"
    beta = "completely different text about distributed shuffle hash joins"
    b1 = spark.createDataFrame(
        [(1, alpha), (3, beta)], "doc_id long, text string"
    )
    dedup_ingest_batch(b1, root)

    # sanity: a near-dup of stored doc 1 is currently rejected
    probe = spark.createDataFrame([(10, alpha)], "doc_id long, text string")
    dedup_ingest_batch(probe, root)
    assert {r.doc_id for r in spark.read.parquet(f"{root}/docs").collect()} == {1, 3}

    stats = forget_documents(spark, root, [1])
    assert stats["docs"]["rows_deleted"] == 1
    assert stats["sets"]["rows_deleted"] > 0  # shingle rows scrubbed
    assert stats["bands"]["rows_deleted"] == 16  # one row per LSH band
    for tier in ("docs", "sets", "bands"):
        ids = {r.doc_id for r in spark.read.parquet(f"{root}/{tier}").collect()}
        assert 1 not in ids and 3 in ids

    # the same near-dup is now ADMITTED
    dedup_ingest_batch(probe, root)
    assert {r.doc_id for r in spark.read.parquet(f"{root}/docs").collect()} == {3, 10}


def test_forget_vectors_scrubs_index_and_search(spark, tmp_path):
    from sales_forecast_mlops_at_scale_spark.streaming.vector_ingest import (
        search_materialized,
        vector_ingest_batch,
    )

    root = str(tmp_path / "index")

    def vec(seed):
        return [float(((seed * 31 + d * 7) % 1009) - 504) for d in range(64)]

    seed = spark.createDataFrame(
        [(i, vec(i)) for i in range(40)], "vec_id long, embedding array<double>"
    )
    vector_ingest_batch(seed, root, dim=64, batch_id=0)
    dup = spark.createDataFrame(
        [(100, vec(7))], "vec_id long, embedding array<double>"
    )
    vector_ingest_batch(dup, root, dim=64, batch_id=1)

    q = spark.createDataFrame([(7, vec(7))], "vec_id long, embedding array<double>")
    hits = search_materialized(spark, root, q, k=5, dim=64, rerank=10).collect()
    assert any(r.nn_id == 100 for r in hits)

    stats = forget_vectors(spark, root, [100])
    assert stats["vectors"]["rows_deleted"] == 1
    assert stats["assignments"]["rows_deleted"] == 1
    assert stats["codes"]["rows_deleted"] == 32  # M code rows per vector
    # quantizers are frozen metadata — untouched by erasure
    assert spark.read.parquet(f"{root}/centroids").count() == 16

    hits = search_materialized(spark, root, q, k=5, dim=64, rerank=10).collect()
    assert hits and all(r.nn_id != 100 for r in hits)
    assert all(
        100 not in {r.vec_id for r in spark.read.parquet(f"{root}/{t}").collect()}
        for t in ("vectors", "assignments", "codes")
    )


def test_forget_vectors_scrubs_rejected_audit_log_both_sides(spark, tmp_path):
    """The rejected audit log references ids in BOTH columns (the
    rejected vector and the retained match it scored against) — erasure
    of either id must scrub the row."""
    from sales_forecast_mlops_at_scale_spark.streaming.vector_ingest import (
        vector_ingest_batch,
    )

    root = str(tmp_path / "index")

    def vec(seed):
        return [float(((seed * 31 + d * 7) % 1009) - 504) for d in range(64)]

    seed = spark.createDataFrame(
        [(i, vec(i)) for i in range(40)], "vec_id long, embedding array<double>"
    )
    vector_ingest_batch(seed, root, dim=64, batch_id=0, dedup_threshold=0.99)
    dup = spark.createDataFrame(
        [(100, vec(7)), (101, vec(8))], "vec_id long, embedding array<double>"
    )
    vector_ingest_batch(dup, root, dim=64, batch_id=1, dedup_threshold=0.99)
    rej = spark.read.parquet(f"{root}/rejected")
    assert {(r.vec_id, r.matched_id) for r in rej.collect()} == {(100, 7), (101, 8)}

    # forgetting the MATCH (7) scrubs the row that references it
    forget_vectors(spark, root, [7])
    left = {(r.vec_id, r.matched_id) for r in spark.read.parquet(f"{root}/rejected").collect()}
    assert left == {(101, 8)}
    # forgetting the REJECTED id scrubs its own audit row
    forget_vectors(spark, root, [101])
    assert spark.read.parquet(f"{root}/rejected").count() == 0


def test_forget_differential_vs_full_rewrite_randomized(spark, tmp_path):
    """Property: the file-surgical delete leaves EXACTLY the rows a
    full-table anti-join would — across randomized layouts (file count,
    duplicate keys spanning files, NULL keys, tombstones that miss).
    NULL keys never match a tombstone (SQL IN semantics) and must
    always survive."""
    import random

    for seed in (7, 23, 1009):
        rng = random.Random(seed)
        path = str(tmp_path / f"t{seed}")
        rows = []
        for fi in range(rng.randint(2, 5)):
            chunk = [
                (
                    rng.choice([None] + list(range(20))),
                    f"f{fi}-r{ri}",
                )
                for ri in range(rng.randint(3, 12))
            ]
            rows += chunk
            spark.createDataFrame(
                chunk, "k long, v string"
            ).coalesce(1).write.mode("append").parquet(path)
        tombs = rng.sample(range(25), rng.randint(1, 6))  # some miss

        stats = forget_keys(spark, path, tombs, "k")
        expect = sorted(
            ((k, v) for k, v in rows if k is None or k not in tombs),
            key=str,
        )
        got = sorted(
            ((r.k, r.v) for r in spark.read.parquet(path).collect()),
            key=str,
        )
        assert got == expect, f"seed {seed}: {stats}"
        assert stats["rows_deleted"] == len(rows) - len(expect)


def test_merge_upsert_replaces_matched_and_inserts_new(spark, tmp_path):
    from sales_forecast_mlops_at_scale_spark.streaming.forget import (
        merge_upsert,
    )

    path = str(tmp_path / "t")
    _three_file_table(spark, path)
    before = _file_states(path)

    updates = spark.createDataFrame(
        [(5, "NEW-5"), (5, "NEW-5"), (100, "NEW-100")], ["k", "v"]
    )
    stats = merge_upsert(spark, path, updates, ["k"])
    assert stats["rows_deleted"] == 1      # old k=5 replaced
    assert stats["rows_inserted"] == 2     # deduped updates
    assert stats["files_rewritten"] == 1   # only k=5's file touched
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got[5] == "NEW-5" and got[100] == "NEW-100"
    assert len(got) == 31
    assert got[6] == "payload-6"
    after = _file_states(path)
    kept = set(before) & set(after)
    assert len(kept) == 2 and all(before[f] == after[f] for f in kept)

    # pure insert (no key matches): nothing rewritten
    stats = merge_upsert(
        spark, path, spark.createDataFrame([(200, "I")], ["k", "v"]), ["k"]
    )
    assert stats["files_rewritten"] == 0 and stats["rows_inserted"] == 1
    assert spark.read.parquet(path).count() == 32


def test_merge_upsert_snapshot_single_version_flip(spark, tmp_path):
    from sales_forecast_mlops_at_scale_spark.streaming.forget import (
        merge_upsert,
    )
    from sales_forecast_mlops_at_scale_spark.streaming.snapshots import (
        enable_snapshots,
        latest_version,
        read_manifest,
        read_snapshot,
    )

    path = str(tmp_path / "t")
    _three_file_table(spark, path)
    enable_snapshots(path)

    updates = spark.createDataFrame([(5, "NEW-5"), (99, "NEW-99")], ["k", "v"])
    stats = merge_upsert(spark, path, updates, ["k"])
    assert stats["rows_deleted"] == 1 and stats["rows_inserted"] == 2
    # delete-matched + insert is ONE committed version, not two
    assert latest_version(path) == 2
    assert read_manifest(path)["op"] == "merge"
    got = {r.k: r.v for r in read_snapshot(spark, path).collect()}
    assert got[5] == "NEW-5" and got[99] == "NEW-99" and len(got) == 31
    assert spark.read.parquet(path).count() == 31  # default vacuumed


def test_merge_upsert_moves_row_across_partitions(spark, tmp_path):
    """A matched key whose update carries a DIFFERENT partition value:
    the old row dies in its partition, the new row lands in the new
    one — the layout stays Hive-valid throughout."""
    from sales_forecast_mlops_at_scale_spark.streaming.forget import (
        merge_upsert,
    )

    path = str(tmp_path / "t")
    _partitioned_table(spark, path)  # k 0-9 in d=0, 10-19 in d=1, ...
    updates = spark.createDataFrame([("moved-5", 5, 2)], ["v", "k", "d"])
    stats = merge_upsert(spark, path, updates, ["k"])
    assert stats["rows_deleted"] == 1 and stats["rows_inserted"] == 1
    got = spark.read.parquet(path)
    moved = got.where(F.col("k") == 5).collect()
    assert len(moved) == 1 and moved[0].d == 2 and moved[0].v == "moved-5"
    assert got.count() == 30


def test_merge_upsert_crash_after_journal_retries_idempotently(
    spark, tmp_path, monkeypatch
):
    """Crash after the merge journal landed (heal moves interrupted):
    the retry heals forward, and re-running the SAME merge converges —
    matched keys are replaced by identical rows, no duplicates."""
    import os as _os

    from sales_forecast_mlops_at_scale_spark.streaming.forget import (
        merge_upsert,
    )

    path = str(tmp_path / "t")
    _three_file_table(spark, path)
    updates = spark.createDataFrame([(5, "NEW-5"), (99, "NEW-99")], ["k", "v"])

    real_rename = _os.rename
    state = {"journal_landed": False}

    def exploding(src, dst):
        real_rename(src, dst)
        if dst.endswith(_JOURNAL):
            state["journal_landed"] = True
            raise OSError("injected crash right after the journal commit")

    monkeypatch.setattr(_os, "rename", exploding)
    try:
        merge_upsert(spark, path, updates, ["k"])
        raise AssertionError("injection did not fire")
    except OSError:
        pass
    finally:
        monkeypatch.setattr(_os, "rename", real_rename)
    assert state["journal_landed"]

    stats = merge_upsert(spark, path, updates, ["k"])  # heal + re-merge
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert len(got) == 31  # 30 - 1 replaced + 1 replacement + 1 new
    assert got[5] == "NEW-5" and got[99] == "NEW-99"
    assert stats["rows_inserted"] == 2
    assert not os.path.exists(os.path.join(path, _JOURNAL))


def test_run_forget_stream_drains_tombstone_queue(spark, tmp_path):
    """Erasure requests arriving on a stream: each availableNow drain
    applies the accumulated tombstones as one surgical pass; a second
    drain after more requests land picks up ONLY the new ids (the
    checkpoint remembers), and replaying an already-erased id is a
    no-op rather than an error."""
    from sales_forecast_mlops_at_scale_spark.streaming.forget import (
        run_forget_stream,
    )

    table = str(tmp_path / "t")
    _three_file_table(spark, table)
    requests = str(tmp_path / "requests")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(requests)

    spark.createDataFrame([(3,), (17,)], "k long").coalesce(1).write.mode(
        "append"
    ).parquet(requests)
    src = spark.readStream.schema("k long").parquet(requests)
    run_forget_stream(
        spark, source=src, table_path=table, key_col="k",
        checkpoint_path=ckpt,
    )
    assert {r.k for r in spark.read.parquet(table).collect()} == (
        set(range(30)) - {3, 17}
    )

    # second wave: one new id + one replayed (already-erased) id
    spark.createDataFrame([(17,), (25,)], "k long").coalesce(1).write.mode(
        "append"
    ).parquet(requests)
    src = spark.readStream.schema("k long").parquet(requests)
    run_forget_stream(
        spark, source=src, table_path=table, key_col="k",
        checkpoint_path=ckpt,
    )
    assert {r.k for r in spark.read.parquet(table).collect()} == (
        set(range(30)) - {3, 17, 25}
    )


def test_compaction_heals_torn_forget_first_no_duplicates(spark, tmp_path):
    """Sequential-composition hazard: a forget that crashed post-journal
    followed by a COMPACTION.  Compaction's aux-entry copy would carry
    the stale journal through its rewrite; healing it afterwards would
    move the staged survivors in on top of rows the compaction already
    kept — duplicates.  Compaction must therefore heal the torn forget
    at entry, and the final table must hold exactly the post-forget
    rows, once each."""
    from sales_forecast_mlops_at_scale_spark.streaming.compact import (
        compact_parquet_table,
    )

    path = str(tmp_path / "t")
    _three_file_table(spark, path)
    victim = next(
        f for f in _file_states(path) if any(
            r.k == 5 for r in spark.read.parquet(os.path.join(path, f)).collect()
        )
    )
    # torn forget: journal landed, no file moved yet (crash point)
    staging = path + ".forget-0ddba11"
    survivors = spark.read.parquet(os.path.join(path, victim)).where(
        F.col("k") != 5
    )
    survivors.coalesce(1).write.parquet(staging)
    adds = []
    for f in os.listdir(staging):
        if f.endswith(".parquet") and not f.startswith(("_", ".")):
            final = f"forget-0ddba11-{f}"
            os.rename(os.path.join(staging, f), os.path.join(staging, final))
            adds.append(final)
    with open(os.path.join(path, _JOURNAL), "w", encoding="utf-8") as fh:
        json.dump({"staging": staging, "add": adds, "delete": [victim]}, fh)

    stats = compact_parquet_table(spark, path, sort_by=["k"])
    assert stats["rows"] == 29  # forget healed first, THEN compacted
    got = spark.read.parquet(path).collect()
    assert len(got) == 29  # no duplicated survivors
    assert {r.k for r in got} == set(range(30)) - {5}
    assert not os.path.exists(os.path.join(path, _JOURNAL))
    assert not os.path.exists(staging)


def test_forget_invalidates_compaction_marker(spark, tmp_path):
    """After an erasure the tier's layout changed: a compaction that
    previously no-opped via the ``_compacted`` marker must rewrite
    again (the marker digests the file listing)."""
    from sales_forecast_mlops_at_scale_spark.streaming.compact import (
        compact_parquet_table,
    )

    path = str(tmp_path / "t")
    _three_file_table(spark, path)
    first = compact_parquet_table(spark, path, sort_by=["k"])
    assert first["rows"] == 30
    again = compact_parquet_table(spark, path, sort_by=["k"])
    assert again["rows"] is None  # marker hit: no-op

    forget_keys(spark, path, [0], "k")
    third = compact_parquet_table(spark, path, sort_by=["k"])
    assert third["rows"] == 29  # marker invalidated, real rewrite


def _many_file_table(spark, path, n_files=12):
    for lo in range(0, n_files * 10, 10):
        spark.createDataFrame(
            [(i, f"payload-{i}") for i in range(lo, lo + 10)], ["k", "v"]
        ).coalesce(1).write.mode("append").parquet(path)
    assert len(_file_states(path)) == n_files


def test_chunked_broad_delete_matches_unchunked(spark, tmp_path):
    """A broad predicate (matches every file) applied in bounded
    ``max_files_per_pass`` chunks must land the exact same table state
    and aggregate stats as the single-pass form — the driver-memory
    bound costs nothing semantically."""
    from sales_forecast_mlops_at_scale_spark.streaming.forget import (
        delete_where,
    )

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _many_file_table(spark, a)
    _many_file_table(spark, b)
    cond = F.col("k") % 3 == 0
    chunked = delete_where(spark, a, cond, max_files_per_pass=5)
    single = delete_where(spark, b, cond, max_files_per_pass=10_000)
    for key in ("files_total", "files_rewritten", "rows_deleted",
                "rows_before"):
        assert chunked[key] == single[key], key
    assert chunked["files_rewritten"] == 12
    got_a = sorted((r.k, r.v) for r in spark.read.parquet(a).collect())
    got_b = sorted((r.k, r.v) for r in spark.read.parquet(b).collect())
    assert got_a == got_b
    assert {k for k, _ in got_a} == {i for i in range(120) if i % 3}


def test_chunked_forget_keys_bounds_each_pass(spark, tmp_path):
    """Each chunk is its own journaled swap: with a chunk size of 4 and
    12 matched files the pass count is visible through the per-pass
    file-rewrite bursts, and the final state equals a full erasure."""
    path = str(tmp_path / "t")
    _many_file_table(spark, path)
    stats = forget_keys(
        spark, path, list(range(0, 120, 2)), "k", max_files_per_pass=4
    )
    assert stats["files_rewritten"] == 12
    assert stats["rows_deleted"] == 60
    assert {r.k for r in spark.read.parquet(path).collect()} == set(
        range(1, 120, 2)
    )


def test_chunked_delete_crash_between_chunks_converges(
    spark, tmp_path, monkeypatch
):
    """Dying between chunk N and chunk N+1 leaves a healthy table with
    chunk N applied; re-running the same delete finishes the job (the
    already-erased keys match nothing and no-op)."""
    import sales_forecast_mlops_at_scale_spark.streaming.forget as fg

    path = str(tmp_path / "t")
    _many_file_table(spark, path)
    real = fg._surgical_delete
    calls = {"n": 0}

    def crashing(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash between chunks")
        return real(*args, **kwargs)

    monkeypatch.setattr(fg, "_surgical_delete", crashing)
    try:
        fg.delete_where(
            spark, path, F.col("k") % 2 == 0, max_files_per_pass=5
        )
        raise AssertionError("expected simulated crash")
    except RuntimeError as e:
        assert "simulated crash" in str(e)
    # chunk 1 applied, table healthy (journal completed by its own swap)
    assert not os.path.exists(os.path.join(path, _JOURNAL))
    monkeypatch.setattr(fg, "_surgical_delete", real)
    fg.delete_where(spark, path, F.col("k") % 2 == 0, max_files_per_pass=5)
    assert {r.k for r in spark.read.parquet(path).collect()} == set(
        range(1, 120, 2)
    )


def test_chunked_delete_crash_mid_chunk_journal_heals(
    spark, tmp_path, monkeypatch
):
    """Dying right after a mid-sequence chunk's journal lands: the
    journal rolls FORWARD on the next maintenance entry and a re-run
    deletes the rest."""
    import sales_forecast_mlops_at_scale_spark.streaming.forget as fg

    path = str(tmp_path / "t")
    _many_file_table(spark, path)
    real_heal = fg.heal_forget
    calls = {"n": 0}

    def crashing_heal(p):
        # _surgical_delete's trailing heal IS the swap; crashing it on
        # the second chunk leaves that chunk's journal on disk
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash after journal landed")
        return real_heal(p)

    monkeypatch.setattr(fg, "heal_forget", crashing_heal)
    try:
        fg.delete_where(
            spark, path, F.col("k") % 2 == 0, max_files_per_pass=5
        )
        raise AssertionError("expected simulated crash")
    except RuntimeError as e:
        assert "after journal landed" in str(e)
    assert os.path.exists(os.path.join(path, _JOURNAL))
    monkeypatch.setattr(fg, "heal_forget", real_heal)
    # re-running the delete heals the torn chunk first, then finishes
    fg.delete_where(spark, path, F.col("k") % 2 == 0, max_files_per_pass=5)
    assert not os.path.exists(os.path.join(path, _JOURNAL))
    assert {r.k for r in spark.read.parquet(path).collect()} == set(
        range(1, 120, 2)
    )
