"""Deterministic domain-shaped fixture generators (FIXTURES.md §1-§5).

The driver's star-schema fixtures exercise the operators; these generate
the *reference-shaped* tables (``rossman_sales`` / ``forecast_results``)
so the domain pipeline (pipeline.py) is testable end-to-end with the
exact schemas, type quirks (string stateholiday mixing '0'/'a'/'b'/'c'),
and multi-generation forecast ids the reference produces.

Seeded (seed=42) and clock-free: "today"-relative columns take an
explicit ``as_of`` (SURVEY.md §5 determinism rules).  Generation is
driver-side numpy → ``spark.createDataFrame`` — fixtures are small by
design; scale testing uses the driver's parquet.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from .schemas import FORECAST_RESULTS, SALES

SEED = 42


def synthetic_sales(
    spark: SparkSession,
    *,
    n_stores: int = 20,
    n_days: int = 150,
    as_of: _dt.date,
    products: tuple[str, ...] = ("product_A",),
) -> DataFrame:
    """Seeded history mirroring ``rossman_sales`` (db_utils.py:35-47):
    daily rows per (store, product) ending at ``as_of - 1``."""
    rng = np.random.default_rng(SEED)
    end = as_of - _dt.timedelta(days=1)
    rows = []
    rid = 0
    for day_back in range(n_days - 1, -1, -1):
        d = end - _dt.timedelta(days=day_back)
        dow = d.isoweekday()
        for store in range(1, n_stores + 1):
            for product in products:
                rid += 1
                is_open = int(rng.random() < 0.83)
                promo = int(rng.random() < 0.3)
                base = 3000 + 700 * ((store * 7919) % 13) + 800 * promo
                sales = int(rng.gamma(4.0, base / 4.0)) if is_open else 0
                holiday = rng.choice(["0", "0", "0", "0", "a", "b", "c"])
                rows.append(
                    (
                        rid,
                        store,
                        dow,
                        d,
                        min(sales, 41000),
                        min(int(sales / 5.5), 7400) if is_open else 0,
                        is_open,
                        promo,
                        str(holiday),
                        str(int(rng.random() < 0.18)),
                        product,
                    )
                )
    return spark.createDataFrame(rows, SALES)


def synthetic_forecast_results(
    spark: SparkSession,
    *,
    n_stores: int = 10,
    as_of: _dt.date,
    generations: int = 3,
    horizon_days: int = 7,
    products: tuple[str, ...] = ("product_A",),
) -> DataFrame:
    """``forecast_results`` with 2-3 generations per (store, product,
    forecast_date) under distinct ids (FIXTURES.md §3) so latest-per-key
    dedup (J1/W1) is non-trivial."""
    rng = np.random.default_rng(SEED + 1)
    rows = []
    rid = 0
    created_base = _dt.datetime.combine(as_of, _dt.time(6, 0))
    for gen in range(generations):
        for store in range(1, n_stores + 1):
            for product in products:
                if gen > 0 and rng.random() < 0.3:
                    continue  # some keys have fewer generations
                for h in range(horizon_days):
                    rid += 1
                    fdate = _dt.datetime.combine(
                        as_of + _dt.timedelta(days=h), _dt.time(0, 0)
                    )
                    val = int(3000 + 500 * gen + rng.integers(0, 800))
                    rows.append(
                        (
                            rid,
                            store,
                            product,
                            fdate,
                            val,
                            int(val * 0.9),
                            int(val * 1.1),
                            f"prophet-retail-forecaster-store-{store}-{product}",
                            str(gen + 1),
                            created_base + _dt.timedelta(minutes=rid),
                        )
                    )
    return spark.createDataFrame(rows, FORECAST_RESULTS)
