"""Incremental grouped retraining: only re-fit groups whose series changed.

The reference retrains EVERY (store, product) model weekly regardless of
whether the store reported new sales (``ray_train_all_job.py`` fans out
all 1,115 tasks each run).  At 1M+ groups with a few percent daily churn
that is ~30-100× wasted compute — and the waste grows with scale, since
the grouped-map retrain is the dominant job cost.

:func:`incremental_train` keeps a MATERIALIZED metrics tier (parquet +
atomic pointer swap, the same filesystem discipline as
``streaming/vector_ingest``'s index tiers) carrying, per group, the CV
metrics AND an order-independent content fingerprint of the series rows
that produced them.  Each run:

1. fingerprints the current series per group — ``count`` + commutative
   ``bit_xor`` + commutative decimal ``sum`` of per-row
   ``xxhash64(date, y)``; any insert, update, or delete anywhere in a
   group's history moves the fingerprint unless it simultaneously
   collides all three (the sum exists because XOR alone cancels on
   even-multiplicity multiset swaps, e.g. {h,h} → {g,g}),
2. joins against the stored tier: unchanged groups CARRY their stored
   metrics, changed/new groups are STALE, vanished groups are dropped,
3. retrains ONLY the stale groups (semi-join prune feeding the batched
   grouped map — the series is never reshuffled: the fingerprint agg and
   the semi-join both reuse the series' key partitioning, and the
   *small* per-group frames are what shuffle),
4. publishes carried ∪ fresh as a new state generation and atomically
   swaps the ``_CURRENT`` pointer (``os.replace``); a crash before the
   swap leaves a torn, unreferenced generation that is never read.  A
   fully quiescent run (no adds, changes, or deletes) publishes nothing
   and returns the committed generation as-is; after each commit,
   generations older than (current, predecessor) are garbage-collected.

Because the model is a pure function of its group's series, the output
is BIT-IDENTICAL to a full retrain — which is exactly what the DuckDB
oracle checks (``plans/ml_queries._TRAIN_SQL`` re-derives the full
training run from raw data; the incremental tier must hash-match it on
every run, cold or warm).  Changed hyperparameters (keys / model /
n_splits) invalidate the whole tier via a params marker.

Scale note: :func:`incremental_train` itself fingerprints by scanning
the series once per run; an ingest path with CDC batches can skip that
scan entirely by maintaining the fingerprint table via
:func:`delta_fingerprints` + :func:`merge_fingerprints` — XOR is
self-inverse, so inserts and deletes both fold in as one commutative
merge (fingerprint(old ⊎ delta) == merge(fp(old), fp(delta)),
property-tested), and the stored table is the same shape either way.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .train import train_groups

_FP_COLS = ("fp_rows", "fp_content", "fp_sum")
_POINTER = "_CURRENT"
_PARAMS = "_PARAMS.json"


def series_fingerprints(
    series: DataFrame,
    keys: Sequence[str],
    *,
    date_col: str = "ds",
    y_col: str = "y",
) -> DataFrame:
    """Per-group content fingerprint: exact row count + commutative XOR
    + commutative SUM of per-row ``xxhash64`` over (date, y) as strings
    (string casts make the hash input engine- and type-stable).  All
    three are order-independent, so partial aggregation composes freely.

    The XOR alone is blind to replacing one EVEN-multiplicity row
    multiset with another of equal count ({h,h} and {g,g} both cancel);
    the SUM moves under exactly that class (2h → 2g), so a carried
    'unchanged' verdict requires a simultaneous count+xor+sum collision.
    The sum runs in DECIMAL(38,0): ANSI mode would throw on a long
    overflow, and decimal stays exact and mergeable for 10**19 rows."""
    row_hash = F.xxhash64(
        F.col(date_col).cast("string"), F.col(y_col).cast("string")
    )
    return series.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("fp_rows"),
        F.bit_xor(row_hash).alias("fp_content"),
        F.sum(row_hash.cast("decimal(20,0)"))
        .cast("decimal(38,0)")
        .alias("fp_sum"),
    )


def delta_fingerprints(
    delta: DataFrame,
    keys: Sequence[str],
    *,
    date_col: str = "ds",
    y_col: str = "y",
    op_col: str | None = None,
) -> DataFrame:
    """Fingerprint CONTRIBUTION of a change batch, mergeable into a stored
    fingerprint table with :func:`merge_fingerprints`.

    XOR is self-inverse, so a deletion is just re-XORing the removed
    row's hash; ``op_col`` (+1 insert / -1 delete, any numeric) drives
    the row-count delta while every row's hash XORs in unconditionally.
    ``op_col=None`` treats the whole batch as inserts.  This is what lets
    an ingest path keep fingerprints current WITHOUT rescanning history:
    fingerprint(old ⊎ delta) == merge(fingerprint(old), delta_fingerprints
    (delta)) — property-tested in ``tests/test_ml_incremental.py``."""
    op = F.lit(1) if op_col is None else F.col(op_col).cast("long")
    row_hash = F.xxhash64(
        F.col(date_col).cast("string"), F.col(y_col).cast("string")
    )
    # the sum contribution is SIGNED (insert adds the hash, delete
    # subtracts it — sum's self-inverse, like XOR's re-XOR); multiply in
    # decimal so op=-1 against Long.MIN_VALUE cannot overflow under ANSI
    signed = op.cast("decimal(2,0)") * row_hash.cast("decimal(20,0)")
    return delta.groupBy(*keys).agg(
        F.sum(op).alias("fp_rows"),
        F.bit_xor(row_hash).alias("fp_content"),
        F.sum(signed).cast("decimal(38,0)").alias("fp_sum"),
    )


def merge_fingerprints(prev: DataFrame, delta: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Combine a stored fingerprint table with a batch's
    :func:`delta_fingerprints`: counts add, content XORs; groups whose
    merged count reaches 0 vanish (fully deleted).  Both inputs carry
    ``(keys..., fp_rows, fp_content)``; commutative and associative, so
    ingest batches can fold in any order."""
    keys = list(keys)
    p = prev.select(*keys, *_FP_COLS)
    d = delta.select(*keys, *_FP_COLS)
    merged = (
        p.unionByName(d)
        .groupBy(*keys)
        .agg(
            F.sum("fp_rows").alias("fp_rows"),
            F.bit_xor("fp_content").alias("fp_content"),
            F.sum("fp_sum").cast("decimal(38,0)").alias("fp_sum"),
        )
    )
    return merged.filter(F.col("fp_rows") > 0)


def _params_sig(keys, model_spec, n_splits, date_col, y_col) -> str:
    return json.dumps(
        {
            "keys": list(keys),
            "model": model_spec,
            "n_splits": n_splits,
            "date_col": date_col,
            "y_col": y_col,
            # v2: fp_sum column added to the fingerprint schema — old
            # generations (no fp_sum) invalidate cleanly into a full
            # retrain instead of a schema mismatch
            "v": 2,
        },
        sort_keys=True,
    )


def _current_gen(state_root: str) -> str | None:
    ptr = os.path.join(state_root, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        return fh.read().strip()


def _gc_generations(state_root: str, keep: set[str | None]) -> None:
    """Drop generation directories other than the one just committed and
    its predecessor.  Keeping exactly one superseded generation gives
    in-flight readers of the previous pointer a grace window; a reader
    pinned to an older generation (two commits behind) is out of
    contract, same as any table-retention policy."""
    import shutil

    for name in os.listdir(state_root):
        if name.startswith("gen-") and name not in keep:
            shutil.rmtree(os.path.join(state_root, name), ignore_errors=True)
        elif name.startswith(".ptr-"):
            # a crash between writing the pointer temp and os.replace
            # orphans it; nothing else ever reaps these
            try:
                os.unlink(os.path.join(state_root, name))
            except OSError:
                pass


def _read_state(
    spark: SparkSession, state_root: str, params_sig: str
) -> DataFrame | None:
    """Current generation's metrics+fingerprint table, or None when there
    is no committed pointer or the stored params don't match (a changed
    geometry silently invalidates the whole tier)."""
    ptr = os.path.join(state_root, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        gen = fh.read().strip()
    gen_dir = os.path.join(state_root, gen)
    marker = os.path.join(gen_dir, _PARAMS)
    if not os.path.exists(marker):
        return None
    with open(marker) as fh:
        if fh.read() != params_sig:
            return None
    return spark.read.parquet(os.path.join(gen_dir, "metrics"))


def incremental_train(
    series: DataFrame,
    state_root: str,
    keys: Sequence[str] = ("store", "productname"),
    *,
    model_spec: str = "seasonal_naive",
    n_splits: int = 5,
    date_col: str = "date",
    y_col: str = "sales",
    pre_partitioned: bool = False,
    stats: dict | None = None,
) -> DataFrame:
    """CV metrics for every group of ``series`` — identical to
    ``train_groups(series, ...)`` — retraining only groups whose
    fingerprint changed since the last committed state generation.

    Pass ``stats={}`` to receive ``n_groups / n_stale / n_carried`` (the
    warm path reuses the quiescence-check counts; the cold path runs two
    counts over the SMALL per-group frames).  Returns the published
    generation read back from disk, so repeated evaluation of the result
    is a stable parquet scan, not a training job.

    SINGLE WRITER per ``state_root`` between runs — the same contract as
    every maintenance pass in this repo: two concurrent trainers could
    GC each other's freshly committed generation (the weekly-retrain
    cadence this models is scheduler-serialized by nature)."""
    spark = series.sparkSession
    keys = list(keys)
    sig = _params_sig(keys, model_spec, n_splits, date_col, y_col)
    os.makedirs(state_root, exist_ok=True)
    prev = _read_state(spark, state_root, sig)

    # the small per-group fingerprint frame feeds the stale probe, the
    # carry semi-join, the fresh-metrics join, and (optionally) stats —
    # pin it for the function's lifetime
    fp = series_fingerprints(series, keys, date_col=date_col, y_col=y_col).persist()
    try:
        n_stale = n_groups = None
        if prev is None:
            stale_keys = fp.select(*keys)
            carried = None
            # cold start: every group is stale — the semi-join against
            # the full key set would be a no-op probe of every series
            # row on exactly the run that is already the most expensive
            stale_series = series
        else:
            prev_fp = prev.select(
                *keys,
                F.col("fp_rows").alias("__prev_rows"),
                F.col("fp_content").alias("__prev_content"),
                F.col("fp_sum").alias("__prev_sum"),
            )
            j = fp.join(prev_fp, keys, "left")
            stale_keys = j.filter(
                F.col("__prev_rows").isNull()
                | (F.col("__prev_rows") != F.col("fp_rows"))
                | (F.col("__prev_content") != F.col("fp_content"))
                | (F.col("__prev_sum") != F.col("fp_sum"))
            ).select(*keys)
            # quiescent fast path: nothing added/changed AND nothing
            # deleted → the committed generation IS the answer; return it
            # without writing (no generation churn on no-op runs)
            n_stale = stale_keys.count()
            n_groups = fp.count()
            if n_stale == 0 and n_groups == prev.count():
                if stats is not None:
                    stats.update(
                        n_stale=0, n_groups=n_groups, n_carried=n_groups
                    )
                return prev.drop(*_FP_COLS)
            # inner semi-join on keys AND all fingerprint fields: carries
            # only groups that still exist unchanged; vanished groups drop
            carried = prev.join(fp, [*keys, *_FP_COLS], "left_semi")
            stale_series = series.join(stale_keys, keys, "left_semi")
        fresh = train_groups(
            stale_series,
            keys,
            model_spec=model_spec,
            n_splits=n_splits,
            date_col=date_col,
            y_col=y_col,
            pre_partitioned=pre_partitioned,
        )
        fresh_cols = fresh.columns
        fresh_with_fp = fresh.join(fp, keys).select(*fresh_cols, *_FP_COLS)
        out = (
            fresh_with_fp
            if carried is None
            else carried.select(*fresh_cols, *_FP_COLS).unionByName(fresh_with_fp)
        )

        if stats is not None:
            # the warm path already ran these two counts for the
            # quiescence check — don't pay the probe join twice
            stats["n_stale"] = (
                n_stale if n_stale is not None else stale_keys.count()
            )
            stats["n_groups"] = (
                n_groups if n_groups is not None else fp.count()
            )
            stats["n_carried"] = stats["n_groups"] - stats["n_stale"]

        prev_gen = _current_gen(state_root)
        gen = f"gen-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        gen_dir = os.path.join(state_root, gen)
        out.write.mode("errorifexists").parquet(os.path.join(gen_dir, "metrics"))
        with open(os.path.join(gen_dir, _PARAMS), "w") as fh:
            fh.write(sig)
        # commit: pointer write is atomic (os.replace); readers either see
        # the old generation or the fully-written new one, never a torn mix
        tmp = os.path.join(state_root, f".ptr-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as fh:
            fh.write(gen)
        os.replace(tmp, os.path.join(state_root, _POINTER))
        _gc_generations(state_root, keep={gen, prev_gen})

        return spark.read.parquet(os.path.join(gen_dir, "metrics")).drop(*_FP_COLS)
    finally:
        fp.unpersist(False)
