"""Streaming ingest job: JSON event stream → declared-schema parse →
idempotent append sink.

Reproduces the reference's daily drain
(``/root/reference/services/airflow/dags/spark_streaming.py:45-108``):
Kafka source, ``trigger(once=True)``, parse chain, ``foreachBatch`` JDBC
append — with two upgrades flagged in SURVEY.md §2.8:

- ``availableNow`` trigger (the 3.3+ successor of ``once`` — respects
  source rate limits, drains everything then exits: the same
  run-to-completion semantics Airflow schedules daily).
- **Exactly-once sink**: the reference's foreachBatch JDBC append is
  at-least-once (a batch retried after a sink failure re-appends, ST2).
  Here the sink is an anti-join MERGE — each micro-batch drops rows
  whose natural key already exists in the target before appending —
  plus a per-batch commit manifest (``_commits/{app}-{batch}`` marker,
  the one-file form of Delta's (txnAppId, version) dedup) so a
  redelivered batch is skipped without reading the table even when a
  non-atomic store surfaces the prior write's files late.  Combined
  with the checkpoint's offset tracking this makes re-delivery a no-op.

The source is pluggable: a file source (tests, backfills) and Kafka
(production) produce the same ``value``-string frame, so the parse and
sink path is shared — which is also why the parse chain lives in
``operators/ingest.py`` and works on batch frames too.
"""

from __future__ import annotations

import functools
import hashlib
import operator
from collections.abc import Sequence

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.ingest import parse_json_events
from ..schemas import SALES_EVENT


def file_event_source(
    spark: SparkSession, path: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """JSON-lines directory as a stream of raw ``value`` strings (one
    micro-batch per file set) — the test/backfill stand-in for Kafka."""
    reader = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        if max_files_per_trigger
        else spark.readStream.format("text")
    )
    return reader.load(path).select(F.col("value"))


def kafka_event_source(
    spark: SparkSession,
    *,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka topic as raw ``value`` strings (requires the
    spark-sql-kafka package on the classpath; mirrors
    spark_streaming.py:45-53)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
    )


def existing_keys(
    spark: SparkSession,
    target_path: str,
    natural_key: Sequence[str],
    *,
    partition_by: Sequence[str] | None = None,
    partition_values: Sequence[tuple] | None = None,
) -> DataFrame | None:
    """Natural-key projection of the target, pruned to the given partition
    values; ``None`` when the target does not exist yet.

    Only a genuine path-not-found is treated as "first batch" — any other
    read failure (corrupt footer, FS error) PROPAGATES so the micro-batch
    retries instead of silently re-appending without dedup (that would
    break the exactly-once guarantee).
    """
    try:
        existing = spark.read.parquet(target_path)
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return None
        raise
    existing = existing.select(*natural_key)
    if partition_by and partition_values is not None:
        # disjunction over the batch's partition tuples → Catalyst turns it
        # into PartitionFilters on the partitioned parquet layout, so the
        # anti-join probes only the partitions this batch touches instead
        # of scanning the full key history (O(batch partitions), not
        # O(table)).
        if not partition_values:
            return existing.limit(0)
        clause = functools.reduce(
            operator.or_,
            (
                functools.reduce(
                    operator.and_,
                    (F.col(c) == F.lit(v) for c, v in zip(partition_by, tup)),
                )
                for tup in partition_values
            ),
        )
        existing = existing.filter(clause)
    return existing


def _commit_marker_path(spark: SparkSession, target_path: str, name: str):
    """(fs, Path) for the per-batch commit marker under the target's
    ``_commits/`` dir — underscore-prefixed, so every parquet reader
    treats it as hidden metadata, exactly like ``_SUCCESS``."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    marker = jvm.org.apache.hadoop.fs.Path(f"{target_path}/_commits/{name}")
    return marker.getFileSystem(conf), marker


def idempotent_append_batch(
    batch_df: DataFrame,
    target_path: str,
    natural_key: Sequence[str],
    *,
    partition_by: Sequence[str] | None = None,
    batch_id: int | None = None,
    app_id: str = "default",
    coalesce_to: int | None = None,
) -> None:
    """foreachBatch body: append only rows whose natural key is absent
    from the target (left-anti join) — MERGE-insert semantics on parquet.

    ``coalesce_to``: target file count for the APPEND (guide §6 — small
    files hurt twice, listing/planning on the driver and per-file open
    cost on every later read).  Callers whose per-trigger output is
    bounded (an update-mode totals log gains at most |keys touched| rows
    per batch) pass 1 and each drain appends one file instead of one
    per shuffle partition; unbounded appends leave it None and keep the
    batch's own partitioning.  Layout-only: the appended ROWS are
    identical either way.

    With ``partition_by`` set (a prefix of the natural key, e.g. the date
    column), the target is laid out as partitioned parquet and the
    existing-keys scan is pruned to ONLY the partitions present in the
    incoming batch — the collect of the batch's distinct partition tuples
    is tiny (a drain touches a bounded set of dates).  Without it the
    anti-join reads the full key history every batch, which is O(table)
    per micro-batch at warehouse scale.

    **Commit manifest** (``batch_id`` set): after a successful append a
    marker file ``_commits/{app_id}-{batch_id}`` is written under the
    target; a redelivered batch whose marker already exists is skipped
    WITHOUT reading the table.  This closes the last at-least-once
    window of the bare anti-join: on an object store without atomic
    visibility, a completed write whose files surface *after* a retry's
    existing-keys read would otherwise double-append.  The marker is the
    poor-man's form of Delta's per-(appId, version) transaction log —
    same protocol, one file per batch.  A checkpoint reset restarts
    batch ids at 0, so clear ``_commits/`` together with the checkpoint
    (exactly as Delta's ``txnAppId`` tracking requires a new appId).

    At warehouse scale the same logic is one Delta/Iceberg ``MERGE``; the
    anti-join formulation keeps this container dependency-free while
    preserving the semantics.  The existing-keys read is pruned to the
    key columns only (column pruning reaches the scan)."""
    from .snapshots import publish_if_enabled

    spark = batch_df.sparkSession
    fs = marker = None
    if batch_id is not None:
        fs, marker = _commit_marker_path(
            spark, target_path, f"{app_id}-{batch_id}"
        )
        if fs.exists(marker):
            # batch already fully committed — redelivery is a no-op for
            # the DATA, but a crash in the marker→publish window may
            # have left the manifest behind the listing: publishing
            # here (scan-derived, content-idempotent) closes it even
            # when this is the drain's final batch
            publish_if_enabled(target_path)
            return
    batch_df = batch_df.dropDuplicates(list(natural_key))  # in-batch dups
    partition_values: list[tuple] | None = None
    if partition_by:
        partition_values = [
            tuple(r) for r in batch_df.select(*partition_by).distinct().collect()
        ]
    existing = existing_keys(
        spark,
        target_path,
        natural_key,
        partition_by=partition_by,
        partition_values=partition_values,
    )
    if existing is None:
        fresh = batch_df
    else:
        fresh = batch_df.join(existing, on=list(natural_key), how="left_anti")
    if coalesce_to is not None:
        fresh = fresh.coalesce(coalesce_to)
    writer = fresh.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*list(partition_by))
    writer.parquet(target_path)
    if marker is not None:
        # marker LAST: a crash before this line leaves no marker, so the
        # retry re-runs the (idempotent) anti-join append
        fs.createNewFile(marker)
    # atomic reader visibility for the batch (scan-mode publish is
    # correct here: appends only ever ADD files).  A crash between the
    # marker and this line merely delays visibility to the redelivery's
    # or the next batch's publish — never duplicates, never partial.
    publish_if_enabled(target_path)


def run_stream_ingest(
    spark: SparkSession,
    *,
    source: DataFrame,
    target_path: str,
    checkpoint_path: str,
    schema: T.StructType = SALES_EVENT,
    natural_key: Sequence[str] = ("store", "productname", "date"),
    partition_by: Sequence[str] | None = ("date",),
    available_now: bool = True,
) -> None:
    """Run one drain of the stream into ``target_path``.

    Parse (declared schema, P1-P3) → typed columns → idempotent append
    into a date-partitioned target (so every future drain's dedup scan
    prunes to the dates it touches).  Blocks until the ``availableNow``
    drain completes (like the reference's daily Airflow task)."""
    parsed = parse_json_events(source, schema)
    if "date" in [f.name for f in schema.fields]:
        parsed = parsed.withColumn("date", F.to_date("date"))
    # app id ties commit markers to THIS checkpoint's batch-id sequence:
    # a new checkpoint (fresh ids from 0) gets a new marker namespace
    app_id = hashlib.md5(checkpoint_path.encode()).hexdigest()[:12]
    writer = (
        parsed.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(
            lambda batch_df, bid: idempotent_append_batch(
                batch_df,
                target_path,
                natural_key,
                partition_by=partition_by,
                batch_id=bid,
                app_id=app_id,
            )
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    query.awaitTermination()


def windowed_sliding_rollup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: Sequence[str] = ("event_type",),
    window: str = "1 day",
    slide: str = "6 hours",
    watermark: str = "2 days",
) -> DataFrame:
    """Sliding-window aggregate: each event contributes to every
    ``window``-long window on the ``slide`` grid containing it (e.g. a
    1-day window sliding 6h → 4 overlapping windows per event).

    Streaming: watermarked, emitted when windows close.  Batch: identical
    semantics (``F.window`` is trigger-agnostic), which is what makes the
    operator oracle-checkable — windows align to the epoch slide grid in
    both engines."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window, slide).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    *,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """Exactly-once event dedup INSIDE the stream (ST-family upgrade):
    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes, so state is bounded by (keys/interval) instead of
    growing with the full history — the streaming twin of the sink-side
    anti-join MERGE in :func:`idempotent_append_batch`.

    Batch frames fall back to plain ``dropDuplicates`` (same semantics
    when the whole input is one "batch")."""
    if not events.isStreaming:
        return events.dropDuplicates(list(keys))
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def windowed_daily_rollup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: Sequence[str] = ("event_type",),
    watermark: str = "2 days",
) -> DataFrame:
    """Beyond-reference extension (SURVEY.md §2.8): watermarked tumbling
    daily aggregate over an event-time stream — late rows beyond the
    watermark are dropped instead of corrupting closed windows.  Works on
    batch frames too (window() is trigger-agnostic)."""
    df = events
    if df.isStreaming and watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.window(F.col(ts_col), "1 day").alias("day_window"), *keys
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 4).alias("sum_value"),
    ).select(
        F.col("day_window.start").cast("date").alias("day"),
        *keys,
        "n_events",
        "sum_value",
    )


def session_rollup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: Sequence[str] = ("user_id",),
    gap: str = "30 minutes",
    watermark: str = "2 days",
) -> DataFrame:
    """Per-key session aggregate via the native ``session_window``:
    events within ``gap`` (inclusive — an event exactly ``gap`` after
    the previous one still merges) join one session; the reported end is
    ``last event + gap``.

    The streaming form keeps per-(key, open-session) state only until
    the watermark closes the session — the built-in replacement for the
    hand-rolled gaps-and-islands of ``operators/timeseries.sessionize``
    when the input is a stream.  Batch frames run the identical
    expression, which is what the DuckDB islands oracle checks.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(
            *keys,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def _drain_append_parquet(
    df: DataFrame,
    *,
    out_path: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> None:
    """Shared sink for the streaming SERVICE runners: one append-mode
    parquet writer (coalesced to one file per batch — these are
    few-rows-per-trigger logs), checkpoint-coupled, drained to
    completion.  One definition so the sink contract can never drift
    between the four services (code-review r9)."""
    writer = (
        df.coalesce(1)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .format("parquet")
        .option("path", out_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    query.awaitTermination()


def run_windowed_rollup_stream(
    source: DataFrame,
    *,
    out_path: str,
    checkpoint_path: str,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: Sequence[str] = ("event_type",),
    watermark: str = "2 days",
    available_now: bool = True,
) -> None:
    """The watermarked daily rollup as a SERVICE: drain a checkpointed
    event-time stream through :func:`windowed_daily_rollup` in APPEND
    mode to a parquet log — each drain appends exactly the windows the
    advancing watermark closed, late rows for already-closed windows
    are dropped by the engine, and still-open windows stay in state.

    This is the operator family the batch twin (``q_daily_rollup``)
    cannot exercise: the late-data policy itself.  Semantics pinned by
    the ``q_stream_late_data`` oracle: a row in micro-batch ``b``
    survives iff its window end is above the watermark AFTER batch
    ``b−1`` (Spark filters against the previous batch's watermark), and
    the final log holds exactly the windows whose end is at or below
    the final watermark, aggregated over surviving rows.  Exactly-once:
    the append sink is checkpoint-coupled, so a replay drain with no
    new data appends nothing (byte-level no-op, pinned in the fixture
    build).

    Scale: state is O(open windows × keys) — the watermark bounds it by
    eviction; the appended log is a few rows per closed window."""
    rolled = windowed_daily_rollup(
        source,
        ts_col=ts_col,
        value_col=value_col,
        keys=list(keys),
        watermark=watermark,
    )
    _drain_append_parquet(
        rolled,
        out_path=out_path,
        checkpoint_path=checkpoint_path,
        available_now=available_now,
    )


def run_dedup_stream(
    source: DataFrame,
    *,
    out_path: str,
    checkpoint_path: str,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 day",
    available_now: bool = True,
) -> None:
    """:func:`streaming_dedup` as a SERVICE: drain a checkpointed stream
    through ``dropDuplicatesWithinWatermark`` in append mode to a
    parquet log.  Engine semantics pinned by the ``q_stream_dedup``
    oracle (and probed empirically): the FIRST surviving row per key is
    emitted and sets the key's state expiry to ``event_time +
    watermark``; later duplicates are dropped WITHOUT extending the
    expiry; the state is evicted once the watermark (from the previous
    batch — the same one-batch lag as every watermark consumer) passes
    the expiry, after which the key re-emits.  State is O(live keys),
    bounded by the watermark horizon — the scale contract that makes
    stream-side dedup viable at 100 TB/day ingest."""
    deduped = streaming_dedup(
        source, keys=list(keys), ts_col=ts_col, watermark=watermark
    )
    _drain_append_parquet(
        deduped,
        out_path=out_path,
        checkpoint_path=checkpoint_path,
        available_now=available_now,
    )


def run_session_stream(
    source: DataFrame,
    *,
    out_path: str,
    checkpoint_path: str,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: Sequence[str] = ("user_id",),
    gap: str = "30 minutes",
    watermark: str = "2 days",
    available_now: bool = True,
) -> None:
    """:func:`session_rollup` as a SERVICE: drain a checkpointed stream
    through the native ``session_window`` aggregate in append mode to a
    parquet log — a session is emitted once the advancing watermark
    passes its end (last event + gap); still-open sessions stay in
    state.  Engine semantics (probed + pinned by the
    ``q_stream_sessions`` oracle): a row merges only with a session
    still OPEN in state, rows whose own session end trails the previous
    batch's watermark are dropped, and the final log holds exactly the
    sessions closed by the final watermark.  State is O(open sessions ×
    keys), bounded by the watermark horizon."""
    rolled = session_rollup(
        source,
        ts_col=ts_col,
        value_col=value_col,
        keys=list(keys),
        gap=gap,
        watermark=watermark,
    )
    _drain_append_parquet(
        rolled,
        out_path=out_path,
        checkpoint_path=checkpoint_path,
        available_now=available_now,
    )


def run_attribution_stream(
    left: DataFrame,
    right: DataFrame,
    *,
    out_path: str,
    checkpoint_path: str,
    key: str = "user_id",
    left_ts: str = "imp_ts",
    right_ts: str = "conv_ts",
    max_delay: str = "1 hour",
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    how: str = "inner",
    available_now: bool = True,
) -> None:
    """:func:`interval_attribution_join` as a SERVICE: drain two
    checkpointed event streams through the stream-stream interval join
    in append mode to a parquet log.  Engine semantics pinned by the
    ``q_stream_attribution`` oracle (probed empirically): a row below
    the global watermark (min over both sides' ``max event time −
    delay``, one batch behind) is dropped at input EVEN IF a buffered
    partner could still match it; a buffered LEFT row is evicted once
    the watermark passes ``left_ts + max_delay`` (no future right can
    reach it), a buffered RIGHT row once the watermark passes its own
    event time — so a pair emits iff both rows pass their arrival-time
    late filter AND the earlier side's state survives to the later
    side's batch.  With ``how="left_outer"`` (pinned by
    ``q_stream_outer_attr``): an unmatched left row additionally emits
    ONE null-partner row, in the drain whose UPDATED watermark passes
    its eviction point ``left_ts + max_delay`` — exactly when the
    engine can prove no future partner exists; lefts still inside the
    horizon at stream end are withheld.  State is O(rows within the
    watermark horizon), never the full history — the property that
    makes stream-stream attribution viable at ad-scale event rates."""
    joined = interval_attribution_join(
        left,
        right,
        key=key,
        left_ts=left_ts,
        right_ts=right_ts,
        max_delay=max_delay,
        left_watermark=left_watermark,
        right_watermark=right_watermark,
        how=how,
    )
    _drain_append_parquet(
        joined,
        out_path=out_path,
        checkpoint_path=checkpoint_path,
        available_now=available_now,
    )


def chained_window_rollup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: Sequence[str] = ("event_type",),
    watermark: str = "2 days",
    day: str = "1 day",
    period: str = "3 days",
) -> DataFrame:
    """CHAINED stateful operators in one streaming query (Spark 3.5+
    multiple-stateful-operator support): a fine-grained tumbling window
    aggregate whose CLOSED windows feed a second, coarser tumbling
    aggregate via ``window_time`` — the canonical two-level rollup
    (day → period) that previously required two queries and an
    intermediate topic/table.

    Emission semantics (probed empirically; pinned by the
    ``q_stream_chained`` oracle): the cascade completes WITHIN one
    micro-batch drain — when the advancing watermark closes a day
    window, its row flows into the period aggregate in the same batch
    (watermark propagation keeps it from being late-filtered), and a
    period window whose end the same watermark also passed closes with
    ALL its days included.  The final log is therefore the pure
    composition of the two pinned rules: input rows survive the
    single-level late filter, and the log holds every period window
    whose end the final watermark passed, aggregating all surviving
    rows of its days.  Batch frames run the same two-level plan —
    the oracle-able twin."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    daily = df.groupBy(
        F.window(F.col(ts_col), day).alias("__w"), *keys
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("sum_value"),
    )
    staged = daily.select(
        F.window_time("__w").alias("__wts"),
        *keys,
        "n_events",
        "sum_value",
    )
    return (
        staged.groupBy(F.window("__wts", period).alias("__wp"), *keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value"), 4).alias("sum_value"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .select(
            F.col("__wp.start").cast("date").alias("period_start"),
            *keys,
            "n_events",
            "sum_value",
            "n_days",
        )
    )


def run_chained_rollup_stream(
    source: DataFrame,
    *,
    out_path: str,
    checkpoint_path: str,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: Sequence[str] = ("event_type",),
    watermark: str = "2 days",
    day: str = "1 day",
    period: str = "3 days",
    available_now: bool = True,
) -> None:
    """:func:`chained_window_rollup` as a SERVICE: two chained stateful
    aggregates drained in append mode to a parquet log; see the
    operator docstring for the probed cascade semantics."""
    rolled = chained_window_rollup(
        source,
        ts_col=ts_col,
        value_col=value_col,
        keys=list(keys),
        watermark=watermark,
        day=day,
        period=period,
    )
    _drain_append_parquet(
        rolled,
        out_path=out_path,
        checkpoint_path=checkpoint_path,
        available_now=available_now,
    )


def run_enriched_rollup_stream(
    source: DataFrame,
    dim: DataFrame,
    *,
    out_path: str,
    checkpoint_path: str,
    join_key,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: Sequence[str] = ("segment",),
    watermark: str = "2 days",
    available_now: bool = True,
) -> None:
    """STREAM-STATIC join + watermarked rollup as a SERVICE: each
    micro-batch inner-joins the event stream against a static dimension
    frame (re-read per batch — the always-fresh lookup semantics Spark
    gives stream-static joins), then folds into the same watermarked
    daily aggregate as :func:`run_windowed_rollup_stream`.  Rows with no
    dimension match are dropped by the join BEFORE they can touch state
    — the enrichment filter composes with the late-data policy, and the
    ``q_stream_enrich`` oracle pins both at once.  ``join_key`` is a
    join condition column (stream col == dim col).

    Scale: the dim side broadcasts per batch when small (Spark plans the
    batch join normally); state is O(open windows × enriched keys).

    The watermark is declared on the SOURCE, below the join — so ALL
    stream rows advance it, exactly the model the oracle computes.
    Declared above the join it would see only dimension-matched rows,
    and a max-timestamp event the selective dim drops would silently
    lag the engine's watermark behind the oracle's (code-review)."""
    src = source
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    enriched = src.join(dim, join_key, "inner")
    rolled = windowed_daily_rollup(
        enriched,
        ts_col=ts_col,
        value_col=value_col,
        keys=list(keys),
        watermark=None if source.isStreaming else watermark,
    )
    _drain_append_parquet(
        rolled,
        out_path=out_path,
        checkpoint_path=checkpoint_path,
        available_now=available_now,
    )


def run_ttl_rollup_stream(
    source: DataFrame,
    *,
    out_path: str,
    checkpoint_path: str,
    keys: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    ttl: str = "4 days",
    watermark: str = "2 days",
    available_now: bool = True,
) -> None:
    """:func:`..streaming.stateful.streaming_ttl_rollup` as a SERVICE:
    the custom EventTimeTimeout operator drained in append mode to a
    parquet log — only CLOSED segments reach the sink (data batches
    emit nothing), so the native file sink composes directly and a
    replay drain with no new data appends nothing.  Semantics pinned by
    the ``q_stream_ttl`` oracle; see the operator docstring for the
    probed timeout/late-filter rules."""
    from .stateful import streaming_ttl_rollup

    rolled = streaming_ttl_rollup(
        source,
        keys=list(keys),
        ts_col=ts_col,
        value_col=value_col,
        ttl=ttl,
        watermark=watermark,
    )
    _drain_append_parquet(
        rolled,
        out_path=out_path,
        checkpoint_path=checkpoint_path,
        available_now=available_now,
    )


def run_latest_stream(
    source: DataFrame,
    *,
    out_path: str,
    checkpoint_path: str,
    keys: Sequence[str] = ("user_id",),
    order_col: str = "event_id",
    value_col: str = "value",
    tag_col: str = "epoch",
    available_now: bool = True,
) -> None:
    """:func:`..streaming.stateful.streaming_latest_per_key` as a
    SERVICE: the custom ``applyInPandasWithState`` operator (ST5 — the
    arbitrary-stateful successor of the reference's groupwise-max
    self-join, ``/root/reference/services/web-ui/app/db_utils.py:40-62``)
    drained in UPDATE mode through an exactly-once ``foreachBatch``
    upsert into a parquet log.

    Update-mode output cannot use the native file sink, so each batch's
    update rows go through :func:`idempotent_append_batch` keyed on
    ``keys + (tag_col,)`` — the tag is a bigint carried IN the source
    rows, constant per micro-batch (one epoch file per drain), so the
    log's natural key is replay-stable: a redelivered batch re-derives
    the identical rows and the anti-join (plus the per-batch commit
    marker) drops them.  Engine semantics pinned by the
    ``q_stream_latest`` oracle: every key touched by a batch emits
    exactly one row holding the running cross-batch maximum — a batch
    delivering only stale rows re-emits the STORED newest row under the
    new batch's tag, proving state survival across triggers.

    Scale: state is one (order, value) pair per key — RocksDB holds
    billions; each batch shuffles only its own rows; the log gains at
    most |keys touched| rows per trigger."""
    from .stateful import streaming_latest_per_key

    latest = streaming_latest_per_key(
        source,
        keys=list(keys),
        order_col=order_col,
        value_col=value_col,
        tag_col=tag_col,
    )
    app_id = hashlib.md5(checkpoint_path.encode()).hexdigest()[:12]
    writer = (
        latest.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(
            lambda batch_df, bid: idempotent_append_batch(
                batch_df,
                out_path,
                [*keys, tag_col],
                batch_id=bid,
                app_id=app_id,
            )
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    query.awaitTermination()


def run_tws_totals_stream(
    source: DataFrame,
    *,
    out_path: str,
    checkpoint_path: str,
    key_col: str = "user_id",
    tag_col: str = "epoch",
    initial_state: DataFrame | None = None,
    available_now: bool = True,
) -> None:
    """:func:`..streaming.tws.streaming_running_totals` as a SERVICE:
    the Spark-4 ``transformWithStateInPandas`` machine (typed ValueState
    in the RocksDB state store — the modern arbitrary-stateful API)
    drained in UPDATE mode through an exactly-once ``foreachBatch``
    upsert into a parquet log, mirroring :func:`run_latest_stream` for
    the classic API.

    The natural key is ``(key, tag, n)`` — tag is the bigint epoch
    carried IN the source rows (constant per micro-batch), and the
    running count ``n`` is strictly increasing per key across batches,
    so sub-batch emissions under a split drain coexist in the log while
    a REPLAYED batch re-derives byte-identical rows that the anti-join
    (plus the commit marker) drops.  Readers reduce to the final row
    per (key, tag) by max-``n`` — which makes the log's reduced form
    invariant to how a drain's input was split into micro-batches (the
    ``q_stream_tws`` batch-split pin).

    The caller must have set the RocksDB state store provider; TWS
    refuses the default HDFS-backed provider by design.

    Scale: state is one (n, total) pair per key in RocksDB; each batch
    shuffles only its own rows; the log gains at most |keys touched|
    rows per trigger.

    ``initial_state``: optional ``(key, n, total)`` batch seed frame —
    the bootstrap-from-history path (``q_stream_tws_init``); applied by
    the engine exactly once per key at the first micro-batch of a fresh
    checkpoint, never on resume (probed r11)."""
    from .tws import streaming_running_totals

    totals = streaming_running_totals(
        source, key_col=key_col, tag_col=tag_col, initial_state=initial_state
    )
    app_id = hashlib.md5(checkpoint_path.encode()).hexdigest()[:12]
    writer = (
        totals.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(
            lambda batch_df, bid: idempotent_append_batch(
                batch_df,
                out_path,
                [key_col, tag_col, "n"],
                batch_id=bid,
                app_id=app_id,
                # the totals log gains at most |keys touched| rows per
                # trigger — one file per drain, not one per shuffle
                # partition (guide §6; measured: the 96-tiny-file log
                # cost every reader ~0.3 s of listing/open overhead)
                coalesce_to=1,
            )
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    query.awaitTermination()


def run_tws_ttl_stream(
    source: DataFrame,
    *,
    out_path: str,
    checkpoint_path: str,
    keys: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    ttl: str = "4 days",
    watermark: str = "2 days",
    available_now: bool = True,
) -> None:
    """:func:`..streaming.tws.streaming_ttl_rollup_tws` as a SERVICE:
    the modern-API (TWS EventTime timers + typed ValueState) twin of
    :func:`run_ttl_rollup_stream`, drained in append mode to a parquet
    log — only CLOSED segments reach the sink, so the native file sink
    composes and a replay drain appends nothing.  The caller must have
    set the RocksDB state store provider (TWS requirement).  Semantics
    pinned by the ``q_stream_tws_ttl`` oracle (shared verbatim with
    ``q_stream_ttl``) plus a row-for-row cross-API equality guard in
    the fixture build."""
    from .tws import streaming_ttl_rollup_tws

    rolled = streaming_ttl_rollup_tws(
        source,
        keys=list(keys),
        ts_col=ts_col,
        value_col=value_col,
        ttl=ttl,
        watermark=watermark,
    )
    _drain_append_parquet(
        rolled,
        out_path=out_path,
        checkpoint_path=checkpoint_path,
        available_now=available_now,
    )


def interval_attribution_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "ad_id",
    left_ts: str = "imp_ts",
    right_ts: str = "click_ts",
    max_delay: str = "1 hour",
    left_watermark: str = "2 hours",
    right_watermark: str = "3 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join (ad-attribution shape): every right
    event joins left events with the same key where
    ``left_ts <= right_ts <= left_ts + max_delay``.

    For streaming inputs both sides carry watermarks and the time-range
    predicate bounds the buffered state: Spark derives from it how long
    each side's rows must be retained, so state is
    O(key-rate × max_delay), never the full history.  Batch frames run
    the identical join predicate — the oracle-able twin.  With
    ``how="left_outer"`` an unmatched left emits a null-partner row
    once its state evicts (watermark past ``left_ts + max_delay``) —
    the streaming form of "impressions that never converted".
    """
    l, r = left, right
    if l.isStreaming:
        l = l.withWatermark(left_ts, left_watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, right_watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, how).select(
        l[key].alias(key),
        l[left_ts].alias(left_ts),
        r[right_ts].alias(right_ts),
    )
