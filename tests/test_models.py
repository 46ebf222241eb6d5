"""Model adapter tests: the deterministic seasonal-naive contract, and an
import-gated Prophet smoke test (the reference trains Prophet per group,
services/training-service/app/train_utils.py:72-151; this container has no
prophet wheel, so the test self-skips — it runs wherever prophet IS
installed, proving the adapter honors the same fit/predict contract)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from sales_forecast_mlops_at_scale_spark.ml.models import get_model


def _history(n_days: int = 60) -> pd.DataFrame:
    start = dt.date(2025, 11, 1)
    ds = pd.Series([start + dt.timedelta(days=i) for i in range(n_days)])
    y = pd.Series([100 + 10 * (d.weekday() % 7) for d in ds], dtype="float")
    return pd.DataFrame({"ds": pd.to_datetime(ds), "y": y})


def test_seasonal_naive_contract():
    m = get_model("seasonal_naive").fit(_history())
    future = pd.Series(pd.to_datetime([dt.date(2026, 1, 1) + dt.timedelta(days=i) for i in range(7)]))
    out = m.predict(future)
    assert list(out.columns) == ["ds", "yhat", "yhat_lower", "yhat_upper"]
    assert len(out) == 7
    assert (out["yhat_lower"] <= out["yhat"]).all()
    assert (out["yhat"] <= out["yhat_upper"]).all()


def test_prophet_smoke():
    pytest.importorskip("prophet")
    m = get_model("prophet").fit(_history())
    future = pd.Series(pd.to_datetime([dt.date(2026, 1, 1) + dt.timedelta(days=i) for i in range(7)]))
    out = m.predict(future)
    assert list(out.columns) == ["ds", "yhat", "yhat_lower", "yhat_upper"]
    assert len(out) == 7


def test_unknown_model_spec_rejected():
    with pytest.raises(ValueError, match="unknown model spec"):
        get_model("arima")


def test_moving_average_model_interface_parity():
    """MovingAverageModel: trunc(mean of last `window` observations),
    constant across the horizon, same int/interval conventions as the
    naive — and the same semantics the compare kernel inlines."""
    import datetime as dt

    import pandas as pd

    from sales_forecast_mlops_at_scale_spark.ml.models import (
        MovingAverageModel,
        get_model,
    )

    hist = pd.DataFrame(
        {
            "ds": [dt.date(2023, 1, 1) + dt.timedelta(days=i) for i in range(40)],
            "y": [float(100 + (i % 7)) for i in range(40)],
        }
    )
    m = MovingAverageModel(window=28).fit(hist)
    out = m.predict(pd.Series([dt.date(2023, 2, 10), dt.date(2023, 2, 11)]))
    expected = int(hist["y"].tail(28).mean())
    assert list(out["yhat"]) == [expected, expected]
    assert list(out["yhat_lower"]) == [int(expected * 0.9)] * 2
    assert list(out["yhat_upper"]) == [int(expected * 1.1)] * 2
    assert isinstance(get_model("moving_average"), MovingAverageModel)
