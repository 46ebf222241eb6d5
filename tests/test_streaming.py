"""Streaming ingest tests: declared-schema parse, availableNow drain,
checkpoint resume, and exactly-once semantics under duplicate delivery
(FIXTURES.md §2: out-of-order dates, duplicate events, null fields)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sales_forecast_mlops_at_scale_spark.streaming.ingest import (
    file_event_source,
    run_stream_ingest,
    windowed_daily_rollup,
)


def _event(store, date, sales, product="product_A", **kw):
    base = {
        "store": store,
        "dayofweek": 1,
        "date": date,
        "sales": sales,
        "customers": sales // 10,
        "open": 1,
        "promo": 0,
        "stateholiday": "0",
        "schoolholiday": "0",
        "productname": product,
    }
    base.update(kw)
    return base


def _write_batch(dirpath, name, events):
    dirpath.mkdir(parents=True, exist_ok=True)
    (dirpath / name).write_text("\n".join(json.dumps(e) for e in events) + "\n")


def test_stream_ingest_exactly_once(spark, tmp_path):
    src = tmp_path / "stream_in"
    target = str(tmp_path / "sales_table")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [
        _event(1, "2026-01-02", 100),
        _event(2, "2026-01-01", 200),  # out of order
        _event(1, "2026-01-02", 100),  # in-batch duplicate
        _event(3, "2026-01-02", 0, open=0, stateholiday="a"),
    ]
    _write_batch(src, "b1.json", batch1)

    def drain():
        run_stream_ingest(
            spark,
            source=file_event_source(spark, str(src)),
            target_path=target,
            checkpoint_path=ckpt,
        )

    drain()
    got = spark.read.parquet(target)
    assert got.count() == 3  # in-batch dup collapsed
    assert dict(got.dtypes)["date"] == "date"
    assert dict(got.dtypes)["stateholiday"] == "string"

    # re-run with no new files: checkpoint says nothing to do
    drain()
    assert spark.read.parquet(target).count() == 3

    # second batch: one new row + one cross-batch duplicate (re-delivery)
    _write_batch(src, "b2.json", [_event(2, "2026-01-01", 200), _event(4, "2026-01-03", 50)])
    drain()
    final = spark.read.parquet(target)
    assert final.count() == 4  # re-delivered (2, 2026-01-01) not re-appended
    assert final.filter(F.col("store") == 4).count() == 1


def test_windowed_daily_rollup_batch_twin(spark):
    from sales_forecast_mlops_at_scale_spark.catalog import load_table

    from .conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    out = windowed_daily_rollup(ev, keys=("event_type",))
    # golden invariant: rollup preserves totals
    assert out.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    days = out.select("day").distinct().count()
    assert days >= 28  # fixture spans ~1 month
