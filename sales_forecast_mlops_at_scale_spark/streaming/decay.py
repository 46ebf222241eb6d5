"""Incremental exponentially-decayed counters — the streaming twin of
``operators/timeseries.decayed_score``, EXACT to the bit.

The batch operator scores each key as ``Σ value_units · 2^-(A - b(d))``
where ``b(d)`` is the event's epoch-aligned half-life bucket and ``A`` the
newest bucket.  Because bucket membership is epoch-aligned (never
re-binned when the anchor advances) and every contribution is an integer
over the common denominator ``2^shift``, the score decomposes as

    decayed_num(key) = Σ_buckets  units[key, b]  <<  (shift - (A - b))

so the ONLY state a streaming service needs is the per-(key, bucket)
integer sums ``units`` and ``n_events`` — O(keys × (shift+1)) rows, folded
per batch with plain integer addition (commutative ⇒ any batch split,
ordering, or late arrival yields the same state).  The decay itself is
applied at READ time from the current max bucket.  This is the classic
decayed-counter service (feed "trending now" backends), here with a proof
obligation the float version can never meet: ``read_scores`` after any
sequence of ``fold_batch`` calls is **bit-identical** to
``decayed_score`` over the concatenated history (pinned in
tests/test_streaming.py).

Buckets older than ``shift`` half-lives contribute exactly 0 forever (the
anchor only advances), so ``fold_batch`` folds them into a sentinel row
(``bucket = -1``, ``units = 0``) that preserves the exact ``n_events``
total while bounding state — pruning loses nothing, bit-for-bit.

Commit protocol (local-FS substrate, same family as
``streaming/snapshots.py``): each fold writes a fresh ``state_v{N}``
directory and flips a ``LATEST`` pointer via atomic rename; a crash
leaves either the old pointer (fold never happened — caller replays the
batch) or the new one (fold complete).  Torn, unreferenced ``state_v*``
directories above the pointer are removed at the next fold's entry.

Folds are SINGLE-WRITER per root, enforced by a pid-tagged exclusive
claim file (``_WRITER.claim``, ``O_CREAT|O_EXCL``): the per-scope fences
explicitly invite two independent streams to feed one root, and without
mutual exclusion the entry-time heal of writer B would rmtree writer A's
just-renamed, not-yet-committed ``state_v{N+1}`` (indistinguishable from
a torn fold), both writers would collide on the identical staging name,
and the pointer flip would be last-writer-wins — a lost commit (ADVICE
r8).  A rival fold WAITS for the claim; a claim whose owner pid is dead
is adopted (crash recovery).  The claim serializes writers only —
``read_scores`` never takes it.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: sentinel bucket holding n_events of pruned (zero-weight-forever) rows.
#: Must be IMPOSSIBLE as a real bucket: epoch-aligned buckets bottom out
#: at unix_date(0001-01-01) div half_life ≈ -7.2e5, so a -1 sentinel
#: collides with real pre-1970 data (ts 1969-12-25 → bucket -1) and
#: would silently zero it (code-review r8) — use a value no date reaches.
_SENTINEL = -(2**62)

_LATEST = "LATEST"

#: single-writer claim file (pid-tagged, exclusive-create)
_CLAIM = "_WRITER.claim"


#: fences-dict key for folds that pass a batch_id without a scope
_UNSCOPED = "__unscoped__"


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


#: per-root in-process writer locks — a pid-tagged file cannot tell two
#: THREADS of one process apart (thread B would "adopt" thread A's live
#: claim), so same-process writers serialize on these first
_ROOT_LOCKS: dict[str, object] = {}
_ROOT_LOCKS_GUARD = None  # initialized lazily to avoid import-time threading


def _root_lock(root: str):
    import threading

    global _ROOT_LOCKS_GUARD
    if _ROOT_LOCKS_GUARD is None:
        _ROOT_LOCKS_GUARD = threading.Lock()
    with _ROOT_LOCKS_GUARD:
        return _ROOT_LOCKS.setdefault(os.path.realpath(root), threading.Lock())


#: a live-looking owner whose claim mtime is older than this is treated
#: as a recycled pid (the real writer heartbeats the mtime every
#: ``_CLAIM_HEARTBEAT_S``, so only a recycled pid — or a writer wedged
#: this long between two heartbeats — ever ages that far)
_CLAIM_PIDREUSE_AGE_S = 900.0

#: how often the claim holder touches the claim's mtime
_CLAIM_HEARTBEAT_S = 60.0


def _acquire_claim(root: str, *, timeout_s: float = 600.0):
    """Take the single-writer claim: first the in-process per-root lock
    (serializes threads), then a pid-tagged claim FILE (serializes
    processes).  Cross-process hardening (code-review r9 — the O_EXCL +
    separate-write version had two real races):

    - the claim is minted by ``os.link`` of a fully-written temp file,
      so it is NEVER visible without its pid payload (a rival can't
      misread a just-created claim as torn and delete it);
    - orphans (dead owner, our own leaked pid, legacy torn payloads)
      are adopted by ATOMIC RENAME to an adopter-unique name — exactly
      one adopter wins; a loser's rename raises and it re-races
      (unlink-then-recreate let two adopters both "win", with the
      slower unlink deleting the faster one's live claim);
    - a claim whose owner LOOKS alive is left alone below the pid-reuse
      age bar; the holder heartbeats the claim's mtime from a daemon
      thread, so only a recycled pid (or a writer wedged longer than
      the bar between heartbeats) is ever overridden — without the bar
      a crashed writer whose pid the OS recycled would wedge the root
      forever.

    Returns a handle for :func:`_release_claim`, which unlinks the
    claim only if it is still OUR inode (a claim adopted out from under
    a wedged writer must not take the adopter's live claim with it)."""
    import json
    import threading
    import time
    import uuid

    lock = _root_lock(root)
    if not lock.acquire(timeout=timeout_s):
        raise TimeoutError(f"decay writer lock busy in-process: {root}")
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, _CLAIM)
    tag = f"{os.getpid()}-{uuid.uuid4().hex[:8]}"
    tmp = os.path.join(root, f"{_CLAIM}.tmp-{tag}")
    deadline = time.monotonic() + timeout_s
    try:
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(json.dumps({"pid": os.getpid()}))
        while True:
            try:
                os.link(tmp, path)  # atomic mint, payload always present
            except FileExistsError:
                owner = None
                try:
                    with open(path, encoding="utf-8") as fh:
                        owner = json.loads(fh.read()).get("pid")
                except (OSError, ValueError):
                    owner = None  # legacy torn claim → adoptable
                try:
                    age = time.time() - os.path.getmtime(path)
                except OSError:
                    continue  # vanished under us: re-race the mint
                if (
                    owner is not None
                    and int(owner) != os.getpid()
                    and _pid_alive(int(owner))
                    and age < _CLAIM_PIDREUSE_AGE_S
                ):
                    if time.monotonic() > deadline:
                        raise TimeoutError(
                            f"decay writer claim held by live pid {owner}: "
                            f"{path}"
                        )
                    time.sleep(0.05)
                    continue
                adopted = os.path.join(root, f"{_CLAIM}.adopt-{tag}")
                try:
                    os.rename(path, adopted)  # one winner; losers re-race
                except OSError:
                    continue
                try:
                    os.unlink(adopted)
                except OSError:
                    pass
                continue
            break
        ino = os.stat(tmp).st_ino
        os.unlink(tmp)
        stop = threading.Event()

        def _beat() -> None:
            while not stop.wait(_CLAIM_HEARTBEAT_S):
                try:
                    os.utime(path)
                except OSError:
                    return  # claim adopted out from under a wedged run

        beat = threading.Thread(
            target=_beat, name=f"decay-claim-heartbeat-{tag}", daemon=True
        )
        beat.start()
        return (path, lock, ino, stop)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        lock.release()
        raise


def _release_claim(handle) -> None:
    path, lock, ino, stop = handle
    stop.set()
    try:
        # unlink only OUR claim inode: if a rival adopted our (wedged)
        # claim and minted its own, that file is theirs, not ours
        if os.stat(path).st_ino == ino:
            os.unlink(path)
    except OSError:
        pass
    finally:
        lock.release()


def _pointer(root: str) -> dict:
    """Committed pointer: ``{"version": N, "fences": {scope: last_id}}``.
    A fence commits ATOMICALLY with the version flip, so a crashed
    ``foreachBatch`` can never half-commit (fold applied but fence not
    advanced, or vice versa).  Fences are PER SCOPE (one per checkpoint
    identity): epoch ids restart at 0 under a new checkpoint, and two
    independent streams feeding one root must not erase each other's
    fence — a single (scope, id) pair would let stream B's commit reset
    stream A's fence and a subsequent replay of A double-count
    (code-review r8, round 2).  Scope count is bounded by checkpoint
    generations, so the dict stays tiny."""
    import json

    p = os.path.join(root, _LATEST)
    if not os.path.exists(p):
        return {"version": 0, "fences": {}}
    with open(p, encoding="utf-8") as fh:
        raw = fh.read().strip()
    try:
        parsed = json.loads(raw)
    except ValueError:
        parsed = None
    if not isinstance(parsed, dict):  # legacy plain-int pointer
        parsed = {"version": int(raw)}
    if "fences" not in parsed:
        # migrate the single-pair format (or legacy int: no fence)
        if parsed.get("batch_id") is not None:
            scope = parsed.get("fence_scope") or _UNSCOPED
            parsed["fences"] = {scope: int(parsed["batch_id"])}
        else:
            parsed["fences"] = {}
    # fence values are [last_batch_id, commit_seq]: the seq (the state
    # version at commit time) is what lets retention keep the N most
    # recently ACTIVE scopes; legacy bare-int fences migrate as seq 0
    # (oldest — a retired checkpoint generation by definition)
    fences = {
        s: (list(map(int, v)) if isinstance(v, (list, tuple)) else [int(v), 0])
        for s, v in parsed["fences"].items()
    }
    return {"version": int(parsed["version"]), "fences": fences}


def _state_version(root: str) -> int:
    """Committed state version, 0 if none."""
    return int(_pointer(root)["version"])


def _state_dir(root: str, version: int) -> str:
    return os.path.join(root, f"state_v{version}")


def _heal(root: str) -> None:
    """Remove torn artifacts: staging dirs and any state_v* ABOVE the
    committed pointer (a fold that died between the data rename and the
    pointer flip left them unreferenced — by on-disk state, not by any
    in-process flag)."""
    committed = _state_version(root)
    for name in os.listdir(root):
        full = os.path.join(root, name)
        if name.startswith("_staging_"):
            shutil.rmtree(full, ignore_errors=True)
        elif name.startswith("state_v"):
            try:
                v = int(name[len("state_v"):])
            except ValueError:
                continue
            if v > committed:
                shutil.rmtree(full, ignore_errors=True)


def _bucket_sums(
    batch_df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    half_life_days: int,
    value_scale: int,
) -> DataFrame:
    # floor division (matches the batch operator and the DuckDB oracle's
    # `//`): Spark `div` truncates toward zero, which diverges for
    # pre-1970 (negative-day) timestamps — ADVICE r8
    bucket = F.expr(
        f"cast(floor(unix_date(cast({ts_col} as date)) / "
        f"{int(half_life_days)}) as bigint)"
    ).alias("bucket")
    units = F.expr(
        f"cast(round({value_col} * {int(value_scale)}) as bigint)"
    ).alias("__u")
    return (
        batch_df.select(*keys, bucket, units)
        .groupBy(*keys, "bucket")
        .agg(
            F.sum(F.col("__u").cast("decimal(38,0)")).cast("bigint").alias("units"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def fold_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    root: str,
    *,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_days: int = 7,
    value_scale: int = 100,
    shift: int = 8,
    prune: bool = True,
    batch_id: int | None = None,
    fence_scope: str | None = None,
) -> int:
    """Fold one batch into the decayed-counter state; returns the newly
    committed state version.  O(batch + live state) work: the batch
    reduces map-side to (key, bucket) rows before touching the (small)
    state table; history length never enters the cost.

    Exactly-once composition: the commit is a single pointer flip, so a
    caller replaying an uncommitted batch (e.g. foreachBatch after a
    crash) re-folds from the OLD state — never a double count.  Under a
    checkpointed streaming driver pass the epoch id as ``batch_id``:
    the fence commits atomically WITH the fold, so a batch the pointer
    already records is skipped on replay (the fold itself is NOT
    idempotent — re-adding integers double-counts; the fence is what
    turns at-least-once delivery into exactly-once state).
    """
    keys = list(keys)
    os.makedirs(root, exist_ok=True)
    # single-writer fence: heal + stage + mint + flip all run under the
    # claim, so a concurrent fold can neither rmtree this fold's
    # just-renamed state_v nor collide on the staging name nor overwrite
    # the pointer flip (ADVICE r8)
    claim = _acquire_claim(root)
    try:
        return _fold_batch_locked(
            spark,
            batch_df,
            root,
            keys=keys,
            ts_col=ts_col,
            value_col=value_col,
            half_life_days=half_life_days,
            value_scale=value_scale,
            shift=shift,
            prune=prune,
            batch_id=batch_id,
            fence_scope=fence_scope,
        )
    finally:
        _release_claim(claim)


def _fold_batch_locked(
    spark: SparkSession,
    batch_df: DataFrame,
    root: str,
    *,
    keys: list[str],
    ts_col: str,
    value_col: str,
    half_life_days: int,
    value_scale: int,
    shift: int,
    prune: bool,
    batch_id: int | None,
    fence_scope: str | None,
) -> int:
    """The fold body; caller holds the writer claim."""
    _heal(root)
    ptr = _pointer(root)
    version = int(ptr["version"])
    scope_key = fence_scope or _UNSCOPED
    # the fence only applies within ONE checkpoint's epoch numbering
    # (per-scope: a relocated checkpoint restarts ids at 0 under a NEW
    # scope; another stream's commits never touch this scope's fence)
    fenced = ptr["fences"].get(scope_key)
    if (
        batch_id is not None
        and fenced is not None
        and batch_id <= int(fenced[0])
    ):
        return version  # checkpointed replay of an already-folded batch
    # idle micro-batch past the first commit: folding adds nothing —
    # skip the O(state) rewrite.  The FIRST commit is never skipped, so
    # read_scores on a drained-but-empty stream serves an empty state
    # instead of crashing on a never-created state_v dir.  (The isEmpty
    # probe costs one limit-1 job per micro-batch — the same trade
    # vector_ingest_batch makes; the fold job it guards is far larger.)
    if version > 0 and batch_df.isEmpty():
        return version

    merged = _bucket_sums(
        batch_df, keys, ts_col, value_col, half_life_days, value_scale
    )
    if version > 0:
        merged = merged.unionByName(
            spark.read.parquet(_state_dir(root, version))
        )
    merged = merged.groupBy(*keys, "bucket").agg(
        F.sum(F.col("units").cast("decimal(38,0)")).cast("bigint").alias("units"),
        F.sum("n_events").alias("n_events"),
    )
    if prune:
        # zero-weight-forever buckets collapse into the sentinel; their
        # exact n_events ride along, their units are dropped (they can
        # never contribute again — the anchor bucket only advances)
        cutoff = merged.where(F.col("bucket") != _SENTINEL).agg(
            (F.max("bucket") - F.lit(int(shift))).alias("__cutoff")
        )
        stale = (F.col("bucket") < F.col("__cutoff")) | (
            F.col("bucket") == _SENTINEL
        )
        merged = (
            merged.crossJoin(F.broadcast(cutoff))
            .withColumn(
                "bucket",
                F.when(stale, F.lit(_SENTINEL)).otherwise(F.col("bucket")),
            )
            .withColumn(
                "units",
                F.when(F.col("bucket") == _SENTINEL, F.lit(0)).otherwise(
                    F.col("units")
                ),
            )
            .groupBy(*keys, "bucket")
            .agg(
                F.sum(F.col("units").cast("decimal(38,0)"))
                .cast("bigint")
                .alias("units"),
                F.sum("n_events").alias("n_events"),
            )
        )

    staging = os.path.join(root, f"_staging_{version + 1}")
    merged.write.mode("overwrite").parquet(staging)
    final = _state_dir(root, version + 1)
    os.rename(staging, final)
    import json

    tmp = os.path.join(root, "_LATEST.tmp")
    fences = dict(ptr["fences"])
    if batch_id is not None:
        # other scopes' fences untouched; the commit seq stamps recency
        fences[scope_key] = [int(batch_id), version + 1]
    new_ptr = {"version": version + 1, "fences": fences}
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(json.dumps(new_ptr))
    os.replace(tmp, os.path.join(root, _LATEST))
    # keep exactly one superseded version for in-flight readers
    for name in os.listdir(root):
        if name.startswith("state_v"):
            try:
                v = int(name[len("state_v"):])
            except ValueError:
                continue
            if v < version:
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    return version + 1


def read_scores(
    spark: SparkSession,
    root: str,
    *,
    keys: Sequence[str],
    shift: int = 8,
) -> DataFrame:
    """Current decayed scores from the folded state — same schema and
    bit-identical values as ``decayed_score`` over the full history:
    ``keys…, n_events, decayed_num, decayed_units``.

    The anchor is the state's max real bucket (== the bucket of the max
    event date ever folded, since buckets are monotone in date); the
    sentinel row is excluded from the anchor but its ``n_events`` count.
    """
    keys = list(keys)
    state = spark.read.parquet(_state_dir(root, _state_version(root)))
    anchor = state.where(F.col("bucket") != _SENTINEL).agg(
        F.max("bucket").alias("__ab")
    )
    num = F.expr(
        f"CASE WHEN bucket != {_SENTINEL} AND (__ab - bucket) <= {int(shift)} "
        f"THEN shiftleft(units, {int(shift)} - cast(__ab - bucket as int)) "
        "ELSE 0L END"
    )
    return (
        state.crossJoin(F.broadcast(anchor))
        .withColumn("__num", num)
        .groupBy(*keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum(F.col("__num").cast("decimal(38,0)"))
            .cast("bigint")
            .alias("decayed_num"),
        )
        .withColumn(
            "decayed_units",
            F.col("decayed_num").cast("double") / float(1 << shift),
        )
    )


def prune_decay_fences(root: str, *, keep_last_scopes: int = 32) -> dict:
    """Retention for the pointer's fence map (VERDICT r8 #3): scope
    entries accumulate one per checkpoint GENERATION forever — bounded
    in practice, but unbounded in principle, unlike every other governed
    structure here.  Keep the ``keep_last_scopes`` most recently
    COMMITTED scopes (by the commit seq each fence carries) and drop the
    rest, through the same claim + atomic pointer rewrite as a fold —
    the state version and surviving fences are untouched.

    Only retire scopes whose checkpoints are gone: a pruned scope's
    stream would re-fold its history on replay (the fence IS its
    exactly-once guarantee).  The keep-most-recent policy encodes
    exactly that — retired generations stop committing, so they age to
    the bottom.  Returns ``{"scopes_removed", "scopes_kept"}``."""
    import json

    if keep_last_scopes < 1:
        raise ValueError("keep_last_scopes must be >= 1")
    os.makedirs(root, exist_ok=True)
    claim = _acquire_claim(root)
    try:
        ptr = _pointer(root)
        fences = ptr["fences"]
        ranked = sorted(fences.items(), key=lambda kv: kv[1][1], reverse=True)
        kept = dict(ranked[: int(keep_last_scopes)])
        removed = len(fences) - len(kept)
        if removed:
            tmp = os.path.join(root, "_LATEST.tmp")
            with open(tmp, "w", encoding="utf-8") as fh:
                fh.write(
                    json.dumps(
                        {"version": int(ptr["version"]), "fences": kept}
                    )
                )
            os.replace(tmp, os.path.join(root, _LATEST))
        return {"scopes_removed": removed, "scopes_kept": len(kept)}
    finally:
        _release_claim(claim)


def run_decay_stream(
    spark: SparkSession,
    *,
    source: DataFrame,
    root: str,
    keys: Sequence[str],
    checkpoint_path: str,
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_days: int = 7,
    value_scale: int = 100,
    shift: int = 8,
    available_now: bool = True,
) -> None:
    """Maintain the decayed-counter state from a stream — the trending
    service's ingestion loop (same source contract as
    ``ingest.run_stream_ingest``: Kafka in production, a file source in
    tests).  Each micro-batch is ONE :func:`fold_batch` commit carrying
    the epoch id as the replay fence, so a crashed/restarted driver's
    at-least-once redelivery folds each batch exactly once.  Blocks
    until the ``availableNow`` drain completes; serve with
    :func:`read_scores` at any time between commits."""

    import hashlib

    # fence ids are only meaningful within one checkpoint's numbering —
    # scope them by the checkpoint identity (vector_ingest convention)
    scope = hashlib.md5(
        os.path.abspath(checkpoint_path).encode()
    ).hexdigest()[:16]

    def _apply(batch_df: DataFrame, bid: int) -> None:
        fold_batch(
            spark,
            batch_df,
            root,
            keys=keys,
            ts_col=ts_col,
            value_col=value_col,
            half_life_days=half_life_days,
            value_scale=value_scale,
            shift=shift,
            batch_id=bid,
            fence_scope=scope,
        )

    writer = (
        source.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(_apply)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    query.awaitTermination()
