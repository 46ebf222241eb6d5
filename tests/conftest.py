"""Shared fixtures: one SparkSession per test run + a DuckDB oracle harness
mirroring the driver's differential check (row-count, schema-compatible
dtypes, order-insensitive value comparison with sorted columns)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from sales_forecast_mlops_at_scale_spark.schemas import STAR_TABLES
from sales_forecast_mlops_at_scale_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("engine-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for order-insensitive comparison: columns sorted by
    name, rows sorted by all columns, stable dtypes."""
    import datetime as _dt

    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None).astype("datetime64[us]")
        elif pdf[c].dtype == object:
            probe = pdf[c].dropna()
            if len(probe) and isinstance(probe.iloc[0], (_dt.date, _dt.datetime)):
                pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
            else:
                pdf[c] = pdf[c].astype(str)
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def assert_matches_oracle(spark_df, con, sql: str, *, float_tol: float = 0.0) -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(con.execute(sql).df())
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    for c in got.columns:
        g, w = got[c], want[c]
        if float_tol and pd.api.types.is_float_dtype(g):
            ok = ((g - w).abs() <= float_tol) | (g.isna() & w.isna())
            assert ok.all(), f"column {c}: max diff {(g - w).abs().max()}"
        else:
            # exact, like the driver's value hash — assert_series_equal's
            # default rtol would hide rounding-boundary divergence
            pd.testing.assert_series_equal(
                g, w, check_names=False, check_dtype=False, check_exact=True
            )
