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

from pyspark.sql import DataFrame

_LIVE: dict[str, tuple[int, str, DataFrame]] = {}


def _plan_key(df: DataFrame) -> tuple[int, str] | None:
    try:
        plan = df._jdf.queryExecution().analyzed()
        # The canonicalized STRING omits source identity (a parquet
        # Relation prints without its path), so same-shaped plans over
        # different directories stringify identically; semanticHash does
        # include relation identity but is only 32 bits.  The sorted
        # input-file digest pins the data: reuse requires hash AND shape
        # AND the exact same source files.  (inputFiles() is a listing,
        # not a scan — once per operator call; at truly huge file counts
        # swap for the FileIndex root paths.)
        files = hashlib.sha256("\n".join(sorted(df.inputFiles())).encode()).hexdigest()
        return plan.semanticHash(), plan.canonicalized().toString() + "#" + files
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
    prev = _LIVE.get(slot)
    if prev is not None:
        ph, pcanon, pdf = prev
        same_session = pdf.sparkSession is df.sparkSession
        if same_session and ph == h and pcanon == canon:
            # a spark.catalog.clearCache() elsewhere unpersists the frame
            # behind the registry's back; returning it as-is would
            # silently lose the cache — re-pin before handing it out
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


def clear_slots() -> None:
    """Unpersist and drop every live slot (tests / session teardown)."""
    for _, _, df in _LIVE.values():
        try:
            df.unpersist(False)
        except Exception:  # noqa: BLE001
            pass
    _LIVE.clear()
