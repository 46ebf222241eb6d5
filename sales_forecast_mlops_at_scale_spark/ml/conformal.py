"""Split-conformal prediction intervals per group, with a coverage audit.

The reference serves Prophet's own ±intervals straight to users
(forecast-service/app/main.py) — intervals that carry no finite-sample
guarantee and are never audited.  Split conformal prediction (Vovk;
Lei et al. 2018) fixes both with distribution-free machinery that is also
*exactly* oracle-checkable:

- **calibrate**: collect absolute residuals of the deployed model on
  held-out data (here: every walk-forward CV fold except the last);
- **radius**: the k-th smallest calibration residual with
  ``k = ⌈(n_cal + 1)·(1 − α)⌉`` — then ``ŷ ± radius`` covers a fresh
  point with probability ≥ 1 − α under exchangeability;
- **audit**: empirical coverage on the LAST fold (never touched by
  calibration) — the number every forecasting service should report
  next to its intervals.

Determinism: residuals are integer-valued (integral demand minus the
int-truncated prediction), the rank ``k`` is computed in PURE integer
arithmetic (``α = a/b`` rational: ``k = (a·(n_cal+1) + b − 1) div b`` —
never ``ceil(n·0.8)``, whose double rounding both engines would have to
share by luck), the order statistic is exact selection, and coverage is
an exact integer ppm.  When ``k > n_cal`` (tiny calibration sets) the
guarantee needs an infinite radius: reported as NULL with vacuous
coverage 10^6 ppm, identically on both sides.

Scale: same single-shuffle ``sorted_group_map`` shape as ml/train.py —
the per-group work is one sort of a few hundred residuals; the
calibration never leaves the executor.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.groupmap import sorted_group_map
from .train import (
    _fold_preds_from_positions,
    _split_bounds,
    _with_time_cols,
)

CONFORMAL_SCHEMA = (
    "l_suppkey long, l_returnflag string, n_cal long, n_eval long, "
    "radius double, coverage_ppm long"
)

#: miscoverage α as an exact rational a/b (default 1/5 → 80% intervals)
ALPHA_NUM = 1
ALPHA_DEN = 5


def conformal_rank(n_cal: int) -> int:
    """``k = ⌈(n_cal + 1)·(1 − α)⌉`` in pure integer arithmetic."""
    a, b = ALPHA_NUM, ALPHA_DEN
    return ((b - a) * (n_cal + 1) + b - 1) // b


def make_conformal_kernel(
    keys: Sequence[str], *, n_splits: int = 5, y_col: str = "y"
):
    import numpy as np

    keys = list(keys)

    def kernel(pdf: pd.DataFrame, starts, ends) -> pd.DataFrame:
        ys_all = pdf[y_col].to_numpy(dtype=float)
        dows_all = pdf["__dow"].to_numpy()
        g = len(starts)
        n_cal_o = np.zeros(g, dtype="int64")
        n_eval_o = np.zeros(g, dtype="int64")
        radius_o = np.full(g, np.nan)
        cov_o = np.full(g, -1, dtype="int64")
        for gi in range(g):
            s, e = int(starts[gi]), int(ends[gi])
            ys = ys_all[s:e]
            dows = dows_all[s:e]
            bounds = [tb for tb in _split_bounds(e - s, n_splits) if tb[0] >= 1]
            if len(bounds) < 2:
                continue  # need ≥1 calibration fold + the eval fold
            wd_pos = [np.nonzero(dows == wd)[0] for wd in range(7)]

            def fold_resid(train_end, test_end):
                yhat = _fold_preds_from_positions(
                    ys, dows, wd_pos, train_end, test_end
                )
                return np.abs(ys[train_end:test_end] - yhat.astype(float))

            cal = np.concatenate([fold_resid(*tb) for tb in bounds[:-1]])
            ev = fold_resid(*bounds[-1])
            n_cal, n_ev = len(cal), len(ev)
            n_cal_o[gi], n_eval_o[gi] = n_cal, n_ev
            k = conformal_rank(n_cal)
            if k > n_cal:
                cov_o[gi] = 1_000_000  # infinite radius: vacuous coverage
                continue
            radius = float(np.sort(cal)[k - 1])
            radius_o[gi] = radius
            cov_o[gi] = int(ev[ev <= radius].size) * 1_000_000 // n_ev
        key_arrs = {k_: pdf[k_].to_numpy()[starts] for k_ in keys}
        out = pd.DataFrame(
            {
                **key_arrs,
                "n_cal": n_cal_o,
                "n_eval": n_eval_o,
                "radius": radius_o,
                "coverage_ppm": cov_o,
            }
        )
        out.loc[out["coverage_ppm"] < 0, "coverage_ppm"] = pd.NA
        out["coverage_ppm"] = out["coverage_ppm"].astype("Int64")
        return out

    return kernel


def conformal_intervals_groups(
    series: DataFrame,
    keys: Sequence[str],
    *,
    n_splits: int = 5,
    date_col: str = "ds",
    y_col: str = "y",
    pre_partitioned: bool = False,
) -> DataFrame:
    """Per-group conformal radius + held-out coverage audit (module doc)."""
    keys = list(keys)
    with_cols = _with_time_cols(series, date_col)
    return sorted_group_map(
        with_cols.select(*keys, "__dow", "__ord", F.col(y_col).alias("y")),
        keys,
        make_conformal_kernel(keys, n_splits=n_splits),
        CONFORMAL_SCHEMA,
        order_cols=["__ord"],
        pre_partitioned=pre_partitioned,
    )


MONDRIAN_SCHEMA = (
    "l_suppkey long, l_returnflag string, isodow int, n_cal long, "
    "n_eval long, radius double, coverage_ppm long"
)


def make_mondrian_kernel(
    keys: Sequence[str], *, n_splits: int = 5, y_col: str = "y"
):
    """Mondrian (weekday-conditional) variant: one calibration set — and
    one radius — PER ISO WEEKDAY within each group.  Marginal conformal
    guarantees only AVERAGE coverage; for a weekday-seasonal series the
    noisy weekdays get under-covered and the quiet ones over-covered.
    Conditioning on the weekday taxonomy (Vovk's Mondrian construction)
    restores the guarantee within every weekday class, at the price of
    7× smaller calibration sets (tiny classes report NULL radius +
    vacuous coverage, exactly like the marginal path)."""
    import numpy as np

    keys = list(keys)

    def kernel(pdf: pd.DataFrame, starts, ends) -> pd.DataFrame:
        ys_all = pdf[y_col].to_numpy(dtype=float)
        dows_all = pdf["__dow"].to_numpy()
        rows: list[tuple] = []
        for gi in range(len(starts)):
            s, e = int(starts[gi]), int(ends[gi])
            ys = ys_all[s:e]
            dows = dows_all[s:e]
            bounds = [tb for tb in _split_bounds(e - s, n_splits) if tb[0] >= 1]
            key_vals = tuple(pdf[k].iloc[s] for k in keys)
            if len(bounds) < 2:
                continue  # group too short for any weekday class
            wd_pos = [np.nonzero(dows == wd)[0] for wd in range(7)]

            def fold_resid(train_end, test_end):
                yhat = _fold_preds_from_positions(
                    ys, dows, wd_pos, train_end, test_end
                )
                r = np.abs(ys[train_end:test_end] - yhat.astype(float))
                return r, dows[train_end:test_end]

            cal_r, cal_d = map(
                np.concatenate,
                zip(*(fold_resid(*tb) for tb in bounds[:-1])),
            )
            ev_r, ev_d = fold_resid(*bounds[-1])
            for wd in range(7):
                cr = np.sort(cal_r[cal_d == wd])
                er = ev_r[ev_d == wd]
                n_cal, n_ev = len(cr), len(er)
                if n_cal == 0 and n_ev == 0:
                    continue  # weekday absent from both windows
                k = conformal_rank(n_cal)
                if k > n_cal:
                    radius, cov = None, 1_000_000 if n_ev else None
                else:
                    radius = float(cr[k - 1])
                    cov = (
                        int((er <= radius).sum()) * 1_000_000 // n_ev
                        if n_ev
                        else None
                    )
                rows.append(
                    (*key_vals, wd + 1, n_cal, n_ev, radius, cov)
                )
        out = pd.DataFrame(
            rows,
            columns=[*keys, "isodow", "n_cal", "n_eval", "radius", "coverage_ppm"],
        )
        out["coverage_ppm"] = out["coverage_ppm"].astype("Int64")
        return out

    return kernel


def mondrian_conformal_groups(
    series: DataFrame,
    keys: Sequence[str],
    *,
    n_splits: int = 5,
    date_col: str = "ds",
    y_col: str = "y",
    pre_partitioned: bool = False,
) -> DataFrame:
    """Weekday-conditional conformal radii + per-weekday coverage audit
    (see :func:`make_mondrian_kernel`)."""
    keys = list(keys)
    with_cols = _with_time_cols(series, date_col)
    return sorted_group_map(
        with_cols.select(*keys, "__dow", "__ord", F.col(y_col).alias("y")),
        keys,
        make_mondrian_kernel(keys, n_splits=n_splits),
        MONDRIAN_SCHEMA,
        order_cols=["__ord"],
        pre_partitioned=pre_partitioned,
    )
