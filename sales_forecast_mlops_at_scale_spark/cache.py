"""Plan-keyed persist slots: bounded, reusable operator caches.

Several operators persist an expensive intermediate (shingle sets,
inverted indexes, signature frames, edge lists) because it feeds two or
more consumers inside one query.  A bare ``df.persist()`` has two
session-lifetime problems:

1. **Accumulation** — every invocation pins a NEW copy of the same data;
   a long-lived session (or a bench loop) accumulates dead cached
   partitions until memory pressure evicts them at random.
2. **No reuse** — two queries over the same corpus (near-dup pairs, then
   clustering, then the dedup report) each rebuild the identical
   intermediate from scratch.

``persist_slot(slot, df)`` fixes both with the same mechanism Spark uses
for its own plan cache: the ANALYZED plan's ``semanticHash`` (confirmed
by canonicalized-plan string equality, so a 32-bit hash collision cannot
alias two different plans) keys a single live cache per named slot.  A
semantically-identical request returns the already-persisted frame; a
different plan (new corpus, new params) unpersists the stale cache and
takes the slot.  Per slot, at most ONE live cache exists — memory is
bounded by construction, and the cache lifetime question ADVICE flagged
for ``jaccard.persist_index`` has a concrete owner: the slot registry.

This is a session-scoped materialized-intermediate cache, not a results
cache: queries remain correct with the registry disabled (drop to plain
``persist``), and a cluster deployment would swap slots for a
materialized table with the same keying.
"""

from __future__ import annotations

import hashlib
import threading
from collections import OrderedDict

from pyspark.sql import DataFrame

_LIVE: dict[str, tuple[int, str, DataFrame]] = {}
#: Serializes slot read-evict-replace: concurrent streaming queries
#: (foreachBatch bodies run on separate driver threads) interleaving on
#: one slot would otherwise each persist a frame and overwrite the
#: other's registry entry — the overwritten frame stays cached with no
#: reference, leaking executor memory every batch.
_LIVE_LOCK = threading.Lock()


_STAT_FILE_CAP = 1024


def _source_files(df: DataFrame) -> list[str]:
    """Input files collected from the ANALYZED logical plan.

    ``df.inputFiles()`` reads the OPTIMIZED plan, which applies cache
    substitution first — so the moment a semantically-equal frame is
    persisted anywhere in the session, ``inputFiles()`` returns ``[]``
    and a name-digest keyed on it flips between invocations, silently
    breaking slot reuse (observed: the first ``persist_slot`` call
    digests the real file list, every later call digests the empty
    list).  The analyzed plan still holds the real relations, so walk
    it and collect every file-based relation's listing; per-node
    failures (streaming relations, exotic sources) are skipped — the
    walk only needs to be DETERMINISTIC across invocations, and a
    consistently-skipped node still is."""
    files, _ = _walk_leaves(df)
    return files


#: Leaf node classes that carry no data of their own, so contributing
#: nothing to the key is correct (the canonicalized string still pins
#: their shape/arguments).
_DATALESS_LEAVES = frozenset({"OneRowRelation", "Range"})


def _walk_leaves(df: DataFrame) -> tuple[list[str], str | None]:
    """Walk the ANALYZED plan once, returning ``(files, data_digest)``.

    ``files`` is every file-based relation's listing (see
    :func:`_source_files` for why the analyzed — not optimized — plan).
    ``data_digest`` covers the leaves that carry data OUTSIDE any file:
    ``LocalRelation`` rows (Arrow-path local frames) are digested from
    their ``UnsafeRow`` string forms, which print the row bytes and are
    deterministic for identical data; ``LogicalRDD`` leaves (what
    PySpark ``createDataFrame`` actually produces, and
    ``localCheckpoint`` outputs) contribute their RDD id — unique for
    the session's lifetime, so two same-schema-different-data frames can
    never share a key (a semantically identical REBUILD gets a fresh id
    and conservatively misses: a miss only costs a rebuild, never
    correctness).  A leaf we can't account for at all makes the digest
    ``None`` — the caller must then treat the plan as UNKEYABLE,
    because the 32-bit ``semanticHash`` would be the key's only
    data-sensitive component and a collision would silently serve
    another dataset's results (ADVICE r6)."""
    files: list[str] = []
    data_parts: list[str] = []
    opaque = False
    root = df._jdf.queryExecution().analyzed()
    stack = [root]
    # subquery expressions (scalar/IN/EXISTS) hang off expressions, not
    # children(), so a child-only walk would silently OMIT their
    # relations from the key — a table referenced only inside a
    # subquery could then be rewritten without changing the key, the
    # exact stale-aliasing class the opaque rule exists to prevent.
    # subqueriesAll is recursive, so ONE py4j call covers every level;
    # if the accessor ever moves, refuse to key rather than under-key.
    try:
        subs = root.subqueriesAll()
        for i in range(subs.size()):
            stack.append(subs.apply(i))
    except Exception:  # noqa: BLE001 — API surface change
        opaque = True
    while stack:
        node = stack.pop()
        ch = node.children()
        n = ch.size()
        if n == 0:
            name = node.getClass().getSimpleName()
            if name == "LogicalRelation":
                try:
                    files.extend(str(f) for f in node.relation().inputFiles())
                except Exception:  # noqa: BLE001 — non-file relation
                    opaque = True
            elif name == "LocalRelation":
                try:
                    data_parts.append(str(node.data().toString()))
                except Exception:  # noqa: BLE001 — inaccessible rows
                    opaque = True
            elif name == "LogicalRDD":
                try:
                    data_parts.append(f"rdd:{node.rdd().id()}")
                except Exception:  # noqa: BLE001 — no rdd accessor
                    opaque = True
            elif name not in _DATALESS_LEAVES:
                opaque = True
        for i in range(n):
            stack.append(ch.apply(i))
    if opaque:
        return sorted(files), None
    digest = hashlib.sha256("\n".join(sorted(data_parts)).encode()).hexdigest()
    return sorted(files), digest


def _files_digest(df: DataFrame) -> str:
    """Digest of the source files behind ``df``: name + size + mtime.

    Names alone under-key: a directory rewritten in place with identical
    file names (compaction, an external writer with deterministic part
    names) would key identically and serve stale cached data.  Size and
    modification time come from the driver-side FileSystem status — one
    metadata RPC per file, same order as the listing itself.  Beyond
    ``_STAT_FILE_CAP`` files the per-file stat cost stops being free, so
    we degrade to names-only; at that point slot reuse assumes
    content-addressed immutable part files (Spark's own writers qualify:
    every part name embeds a job UUID)."""
    try:
        files = _source_files(df)
    except Exception:  # noqa: BLE001 — connect clients
        files = sorted(df.inputFiles())
    return _stamp_files(df, files)


def _stamp_files(df: DataFrame, files: list[str]) -> str:
    entries = files
    if 0 < len(files) <= _STAT_FILE_CAP:
        try:
            sess = df.sparkSession
            jvm = sess._jvm
            hconf = sess._jsc.hadoopConfiguration()
            stamped = []
            fs_cache: dict[str, object] = {}
            for f in files:
                path = jvm.org.apache.hadoop.fs.Path(f)
                scheme = f.split(":", 1)[0] if ":" in f else ""
                fs = fs_cache.get(scheme)
                if fs is None:
                    fs = path.getFileSystem(hconf)
                    fs_cache[scheme] = fs
                st = fs.getFileStatus(path)
                stamped.append(f"{f}#{st.getLen()}#{st.getModificationTime()}")
            entries = stamped
        except Exception:  # noqa: BLE001 — connect clients, exotic FS
            entries = files
    return hashlib.sha256("\n".join(entries).encode()).hexdigest()


def _plan_key(df: DataFrame) -> tuple[int, str] | None:
    try:
        plan = df._jdf.queryExecution().analyzed()
        # The canonicalized STRING omits source identity (a parquet
        # Relation prints without its path), so same-shaped plans over
        # different directories stringify identically; semanticHash does
        # include relation identity but is only 32 bits.  The sorted
        # input-file digest (name+size+mtime, see _files_digest) plus
        # the LocalRelation row digest pin the data: reuse requires
        # hash AND shape AND the exact same leaf data-as-stamped.  A
        # plan with an OPAQUE leaf (LogicalRDD, streaming) is unkeyable
        # — its only data-sensitive key component would be the 32-bit
        # semanticHash, and a collision would silently serve another
        # dataset's cached rows / memoized results (ADVICE r6).
        files, data_digest = _walk_leaves(df)
        if data_digest is None:
            return None
        stamp = _stamp_files(df, files) + "#" + data_digest
        return plan.semanticHash(), plan.canonicalized().toString() + "#" + stamp
    except Exception:  # noqa: BLE001 — connect-only clients etc.
        return None


def derived_key(
    base: tuple[int, str] | None, *params: object
) -> tuple[int, str] | None:
    """A slot key derived from another frame's key plus parameters —
    for operators whose output is a pure function of (input, params)
    but whose OWN plan is too deep to traverse cheaply (e.g. an
    unrolled Lloyd loop doubles its analyzed-plan tree per iteration,
    so ``semanticHash``/``canonicalized`` on it cost driver seconds
    per call; the input scan's key is a few nodes).  The caller owns
    the contract that ``params`` captures everything else that affects
    the output."""
    if base is None:
        return None
    h, canon = base
    tag = repr(params)
    return hash((h, tag)) & 0x7FFFFFFF, canon + "|" + tag


def persist_slot(
    slot: str, df: DataFrame, *, key: tuple[int, str] | None = None
) -> DataFrame:
    """Persist ``df`` under a named slot with plan-keyed reuse/eviction.

    Same semantic plan + same session → the live cached frame is returned
    (no duplicate cache).  Different plan → the stale cache is
    unpersisted (async) and replaced.  Unkeyable plans degrade to plain
    ``persist()``.  Pass ``key`` (see :func:`derived_key`) when the
    frame's own analyzed plan is too deep to key cheaply.
    """
    key = key if key is not None else _plan_key(df)
    if key is None:
        return df.persist()
    h, canon = key
    with _LIVE_LOCK:
        prev = _LIVE.get(slot)
        if prev is not None:
            ph, pcanon, pdf = prev
            same_session = pdf.sparkSession is df.sparkSession
            if same_session and ph == h and pcanon == canon:
                # a spark.catalog.clearCache() elsewhere unpersists the
                # frame behind the registry's back; returning it as-is
                # would silently lose the cache — re-pin first
                if pdf.storageLevel.useMemory or pdf.storageLevel.useDisk:
                    return pdf
                return pdf.persist()
            try:
                pdf.unpersist(False)
            except Exception:  # noqa: BLE001 — stopped session
                pass
        out = df.persist()
        _LIVE[slot] = (h, canon, out)
        return out


_KEYLESS: list[DataFrame] = []

# LRU-bounded: each memoized DataFrame pins a JVM plan tree (MBs for
# Lloyd-unrolled indexes), so an unbounded dict would grow one entry per
# distinct (corpus, queries, params) for the session's lifetime —
# contradicting the bounded-memory contract _LIVE enforces per slot.
# 32 entries covers every amortization pattern we serve (a handful of
# index tiers × a handful of live query batches) while capping driver
# retention; eviction only costs a plan rebuild, never correctness.
_MEMO_CAP = 32

#: One store for both memo flavors; entries are ``(owning_session,
#: value)`` so the lookup logic (liveness, ownership, LRU, cap) exists
#: exactly once.
_MEMO: OrderedDict[tuple[int, str], tuple[object, object]] = OrderedDict()


def _memo(key: tuple[int, str] | None, build_entry, *, session):
    """Shared memo core: ``build_entry() -> (owner, value)``.  A hit is
    served only if its owning session is alive AND (when ``session`` is
    given) is the caller's session; ``session=None`` accepts any live
    owner."""
    if key is None:
        return build_entry()[1]
    # _LIVE_LOCK guards the lookup/insert/evict sequence for the same
    # reason it guards the slots: foreachBatch bodies run on separate
    # driver threads (streaming/dedup_ingest.py routes through plan_memo),
    # and an unguarded read-modify-write on the OrderedDict can corrupt
    # the LRU order or double-build (ADVICE r12).  build_entry() itself
    # runs OUTSIDE the lock — it may take seconds of py4j work and must
    # not serialize unrelated slot traffic.
    with _LIVE_LOCK:
        hit = _MEMO.get(key)
        if hit is not None:
            owner, value = hit
            try:
                alive = owner.sparkContext._jsc is not None
            except Exception:  # noqa: BLE001 — stopped session
                alive = False
            if alive and (session is None or owner is session):
                _MEMO.move_to_end(key)
                return value
    owner, value = build_entry()
    with _LIVE_LOCK:
        _MEMO[key] = (owner, value)
        _MEMO.move_to_end(key)
        while len(_MEMO) > _MEMO_CAP:
            _MEMO.popitem(last=False)
    return value


def plan_memo(
    key: tuple[int, str] | None, builder, *, session=None
) -> DataFrame:
    """Driver-side memo of a CONSTRUCTED plan: same key → the same
    DataFrame object, skipping Python/py4j expression re-construction.

    Orthogonal to :func:`persist_slot` (which caches DATA): building a
    wide plan like the PQ index + ADC search costs ~1 s of pure py4j
    round trips per invocation — pure driver latency, invariant to data
    size, and exactly what a production search tier amortizes by
    constructing its query plan once and serving many.  The key must
    come from :func:`_plan_key`/:func:`derived_key` so it pins the
    source files (digest includes size+mtime): changed inputs or params
    miss and rebuild.  Correctness never depends on a hit — the memo
    returns a plan, not results; evaluation still runs the query.
    ``None`` key (unkeyable session) → always build.  Pass ``session``
    (the caller's ``df.sparkSession``) so a hit built by a DIFFERENT
    concurrent session over the same files is rejected rather than
    served across session boundaries."""

    def build_entry():
        out = builder()
        return out.sparkSession, out

    return _memo(key, build_entry, session=session)


def value_memo(key: tuple[int, str] | None, builder, *, session):
    """Like :func:`plan_memo` but for arbitrary driver-side values whose
    construction ran Spark ACTIONS (an iterative trainer's merge list +
    checkpointed state, a collected anchor) — a repeat call with the
    same key returns the stored value instead of replaying the jobs.
    The caller passes the owning ``session`` explicitly (required, since
    the value itself may not carry one); a hit from a different or
    stopped session is rejected.  Shares the store, LRU cap, and
    ``clear_slots`` lifetime with the plan memo."""
    return _memo(key, lambda: (session, builder()), session=session)


def query_memo(tag: str, base: DataFrame, builder, *params) -> DataFrame:
    """Memoize a query's CONSTRUCTED plan keyed on ``base``'s plan key
    plus ``params`` (optimization r12; the :func:`plan_memo` serving
    pattern at query granularity).  Repeat invocations in one session
    skip the py4j expression construction — a hit returns the plan,
    never results, so every evaluation still computes from the parquet
    inputs; changed input files change the digest and miss.  A ``None``
    param is an UNKEYABLE ingredient (e.g. a second frame whose plan
    key could not be derived) — refuse to key rather than alias two
    different inputs under one memo entry."""
    key = (
        None
        if any(p is None for p in params)
        else derived_key(_plan_key(base), tag, *params)
    )
    return plan_memo(key, builder, session=base.sparkSession)


def track_keyless(df: DataFrame) -> DataFrame:
    """Persist ``df`` WITHOUT plan-keyed reuse but WITH registry-owned
    lifetime: the frame is recorded so :func:`clear_slots` releases it.

    For iterative plans (Lloyd loops) whose intermediate frames must
    stay pinned until the FINAL frame is evaluated — an eager
    unpersist-previous scheme would defeat the persist entirely, since
    nothing materializes until the terminal action — but which would
    otherwise leak one cached frame per iteration per invocation on
    sessions where ``_plan_key`` returns ``None`` (Spark Connect)."""
    out = df.persist()
    _KEYLESS.append(out)
    return out


def clear_slots() -> None:
    """Unpersist and drop every live slot and every tracked keyless
    persist (tests / session teardown)."""
    with _LIVE_LOCK:
        for _, _, df in _LIVE.values():
            try:
                df.unpersist(False)
            except Exception:  # noqa: BLE001
                pass
        _LIVE.clear()
    for df in _KEYLESS:
        try:
            df.unpersist(False)
        except Exception:  # noqa: BLE001
            pass
    _KEYLESS.clear()
    # memoized plans reference the just-unpersisted frames; they'd still
    # recompute correctly, but dropping them keeps lifetimes aligned
    with _LIVE_LOCK:
        _MEMO.clear()
