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

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_latest_per_key(
    events: DataFrame,
    *,
    keys: Sequence[str] = ("user_id",),
    order_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Maintain the max-``order_col`` row per key across micro-batches.

    Emits ``keys + (order_col, value_col)`` for every key touched by the
    current batch, reflecting the running (cross-batch) maximum — a batch
    that only delivers stale rows re-emits the stored newest row.
    """
    keys = list(keys)
    key_fields = ", ".join(
        f"{k} {t}" for k, t in events.select(*keys).dtypes
    )
    _, order_t = dict(events.dtypes)[order_col], dict(events.dtypes)
    out_schema = f"{key_fields}, {order_col} {order_t[order_col]}, {value_col} {order_t[value_col]}"
    state_schema = f"{order_col} {order_t[order_col]}, {value_col} {order_t[value_col]}"

    def update_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        best = tuple(state.get) if state.exists else None
        for pdf in pdfs:
            if pdf.empty:
                continue
            # column-wise extraction with explicit casts: a row slice
            # (`pdf.loc[i]`) upcasts mixed dtypes to float64, and a float
            # written into a bigint state field comes back as null
            i = pdf[order_col].idxmax()
            cand = (int(pdf[order_col][i]), float(pdf[value_col][i]))
            if best is None or cand[0] > best[0]:
                best = cand
        if best is None:
            return
        state.update(best)
        yield pd.DataFrame([(*key, *best)], columns=[*keys, order_col, value_col])

    return events.groupBy(*keys).applyInPandasWithState(
        update_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
