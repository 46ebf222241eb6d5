"""Custom stateful streaming operator via ``applyInPandasWithState``:
latest-row-per-key maintained across micro-batches.

This is the streaming twin of the batch W1 dedup
(``operators/dedup.latest_per_key`` — the reference's groupwise-max
self-join, ``/root/reference/services/web-ui/app/db_utils.py:40-62``):
where the batch operator re-derives "newest row per key" from the full
table every run, this one keeps one tiny state row per key and emits an
update whenever a batch touches the key — the shape that stays O(keys)
in state and O(batch) in work at any stream volume.

Scale notes
-----------
- State is (order, payload) per key — bytes, not rows; RocksDB state
  store holds billions of keys.
- Each micro-batch shuffles only its own rows to their key partitions;
  the grouped-map function sees one Arrow batch iterator per touched key.
- Output mode is ``update``: downstream sinks receive only keys whose
  latest row changed in this batch (idempotent upsert sinks compose with
  it directly).
"""

from __future__ import annotations

import re
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_INTERVAL_MS = {
    "millisecond": 1,
    "second": 1000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
}


def interval_ms(spec: str) -> int:
    """Parse a simple ``"<N> <unit>[s]"`` interval (the subset Spark's
    withWatermark/timeout APIs use here) into milliseconds."""
    m = re.fullmatch(r"\s*(\d+)\s+(\w+?)s?\s*", spec)
    if not m or m.group(2) not in _INTERVAL_MS:
        raise ValueError(f"unsupported interval: {spec!r}")
    return int(m.group(1)) * _INTERVAL_MS[m.group(2)]


def streaming_latest_per_key(
    events: DataFrame,
    *,
    keys: Sequence[str] = ("user_id",),
    order_col: str = "event_id",
    value_col: str = "value",
    tag_col: str | None = None,
) -> DataFrame:
    """Maintain the max-``order_col`` row per key across micro-batches.

    Emits ``keys + (order_col, value_col)`` for every key touched by the
    current batch, reflecting the running (cross-batch) maximum — a batch
    that only delivers stale rows re-emits the stored newest row.

    With ``tag_col`` set (a bigint column CONSTANT within any one
    micro-batch, e.g. an epoch number carried in the source rows), each
    emitted row also carries the batch's tag — giving the update-mode
    output a deterministic, replay-stable identity ``keys + (tag,)``
    that an exactly-once upsert sink can key on (used by the
    ``q_stream_latest`` differential, where tag = epoch file number).
    """
    keys = list(keys)
    key_fields = ", ".join(
        f"{k} {t}" for k, t in events.select(*keys).dtypes
    )
    _, order_t = dict(events.dtypes)[order_col], dict(events.dtypes)
    out_schema = f"{key_fields}, {order_col} {order_t[order_col]}, {value_col} {order_t[value_col]}"
    if tag_col is not None:
        out_schema += f", {tag_col} {order_t[tag_col]}"
    state_schema = f"{order_col} {order_t[order_col]}, {value_col} {order_t[value_col]}"

    # cast the value to match its DECLARED state/output dtype: a Python
    # float written into a bigint state field comes back as null
    # (code-review — the general-API corruption path for integer values)
    value_cast = float if order_t[value_col] in ("double", "float") else int

    def update_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        best = tuple(state.get) if state.exists else None
        tag = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            # column-wise extraction with explicit casts: a row slice
            # (`pdf.loc[i]`) upcasts mixed dtypes to float64
            i = pdf[order_col].idxmax()
            cand = (int(pdf[order_col][i]), value_cast(pdf[value_col][i]))
            if best is None or cand[0] > best[0]:
                best = cand
            if tag_col is not None and tag is None:
                # contract: the tag is CONSTANT within a micro-batch —
                # take the first value verbatim (no max/floor that could
                # mask a contract violation; code-review)
                tag = int(pdf[tag_col].iloc[0])
        if best is None:
            return
        if tag_col is not None and tag is None:
            # the key surfaced with only empty batch frames: no data row
            # carried a tag, so emitting would attach a NULL tag and
            # corrupt the (keys, tag) replay-stable upsert identity the
            # exactly-once sink anti-joins on — skip; state holds the
            # prior best unchanged (ADVICE r9)
            return
        state.update(best)
        row = (*key, *best) if tag_col is None else (*key, *best, tag)
        cols = [*keys, order_col, value_col] + (
            [tag_col] if tag_col is not None else []
        )
        yield pd.DataFrame([row], columns=cols)

    return events.groupBy(*keys).applyInPandasWithState(
        update_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_ttl_rollup(
    events: DataFrame,
    *,
    keys: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    ttl: str = "4 days",
    watermark: str = "2 days",
) -> DataFrame:
    """Per-key TTL counter with CUSTOM event-time eviction
    (``applyInPandasWithState`` + ``EventTimeTimeout``): fold every
    event into a per-key running (count, sum, first_ts, last_ts)
    segment; once the event-time watermark passes ``last_ts + ttl``
    with no new data for the key, the segment CLOSES — the timed-out
    group fires, emits exactly one record, and its state is removed
    (a later event re-opens a fresh segment).

    This is the operator family Spark has no native form for (the
    "activity episode" rollup — ``session_window`` merges on inter-event
    gap at AGGREGATION time; this closes on watermark-observed
    inactivity with arbitrary per-group state), and the reason ST5
    exists in SURVEY §2.  Output mode is APPEND: data batches emit
    nothing; only closures reach the sink, so the native file sink
    composes directly.

    Engine semantics (probed empirically; hash-pinned by the
    ``q_stream_ttl`` oracle):

    - input rows below the PREVIOUS drain's watermark are dropped
      before the function runs (engine-side late filter);
    - a batch delivering data for a key folds it — ``hasTimedOut`` never
      fires in a batch where the key has surviving rows;
    - after the data batch advances the watermark, the SAME drain runs
      an extra no-data batch in which every key whose
      ``last_ts + ttl`` (millisecond precision — the timeout API is ms)
      lies below the UPDATED watermark fires, including keys that
      folded data moments earlier in that very drain;
    - still-open segments are withheld until their timeout fires.

    Scale: state is one 4-field struct per LIVE key (RocksDB holds
    billions); eviction is watermark-driven so state is bounded by the
    ttl horizon; each batch shuffles only its own rows.
    """
    keys = list(keys)
    ttl_ms = interval_ms(ttl)
    dtypes = dict(events.dtypes)
    key_fields = ", ".join(f"{k} {dtypes[k]}" for k in keys)
    out_schema = (
        f"{key_fields}, n_events long, sum_value double, "
        "first_ts timestamp, last_ts timestamp"
    )
    state_schema = "n long, s double, first_us long, last_us long"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, s, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    (
                        *key,
                        int(n),
                        float(s),
                        pd.Timestamp(int(first_us), unit="us"),
                        pd.Timestamp(int(last_us), unit="us"),
                    )
                ],
                columns=[*keys, "n_events", "sum_value", "first_ts", "last_ts"],
            )
            return
        n, s, first_us, last_us = (
            (int(state.get[0]), float(state.get[1]), int(state.get[2]), int(state.get[3]))
            if state.exists
            else (0, 0.0, None, None)
        )
        for pdf in pdfs:
            if pdf.empty:
                continue
            ts_us = pd.to_datetime(pdf[ts_col]).astype("int64") // 1000
            n += int(len(pdf))
            s += float(pdf[value_col].sum())
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        if first_us is None:
            return  # nothing survived the late filter; leave state as-is
        state.update((int(n), float(s), int(first_us), int(last_us)))
        # the timeout API is millisecond-granular; floor matches the
        # oracle's epoch_ms arithmetic (post-1970 domain asserted there)
        state.setTimeoutTimestamp(last_us // 1000 + ttl_ms)
        return  # append mode: data batches emit nothing

    src = events.withWatermark(ts_col, watermark)
    return src.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
