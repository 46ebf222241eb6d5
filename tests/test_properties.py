"""Property-based differential tests (hypothesis): the operators with the
subtlest boundary semantics, checked against independent pure-pandas
references on randomized inputs.

Why these two: the fixture-based oracle gate already proves parity on
the shipped data, but fixtures can miss boundary configurations entirely
— the session-gap end-inclusivity bug was only caught by a hand-built
probe.  Randomized keys/timestamps with deliberate duplicates hunt
exactly those: equal timestamps across sides (asof inclusivity),
equal-gap boundaries (sessionize), multi-row ties (deterministic
collapse).  Examples are kept tiny and few — each example is a real
Spark job."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sales_forecast_mlops_at_scale_spark.operators.timeseries import (
    asof_join,
    sessionize,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# timestamps on a coarse grid so equal-ts and equal-gap collisions are
# common, not astronomically rare
_TS = st.integers(min_value=0, max_value=12)
_KEY = st.integers(min_value=0, max_value=2)
_VAL = st.integers(min_value=-5, max_value=5)


def _to_ts(h: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1) + dt.timedelta(hours=h)


@given(
    left=st.lists(st.tuples(_KEY, _TS), min_size=1, max_size=8),
    right=st.lists(st.tuples(_KEY, _TS, _VAL), min_size=1, max_size=8),
)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    lpdf = pd.DataFrame(
        [{"k": k, "ts": _to_ts(t), "lid": i} for i, (k, t) in enumerate(left)]
    )
    rpdf = pd.DataFrame(
        [{"k": k, "ts": _to_ts(t), "value": v} for (k, t, v) in right]
    )
    # the operator collapses right (key, ts) duplicates to max(payload) —
    # apply the same collapse to the reference input
    rref = (
        rpdf.groupby(["k", "ts"], as_index=False)["value"].max().sort_values("ts")
    )
    expect = pd.merge_asof(
        lpdf.sort_values("ts", kind="mergesort"),
        rref.rename(columns={"value": "asof_value"}),
        on="ts",
        by="k",
        direction="backward",  # inclusive of equal ts, like the operator
    )
    got = asof_join(
        spark.createDataFrame(lpdf),
        spark.createDataFrame(rpdf),
        on=["k"],
        payload=["value"],
    ).toPandas()
    g = got.sort_values("lid").reset_index(drop=True)
    e = expect.sort_values("lid").reset_index(drop=True)
    assert list(g["lid"]) == list(e["lid"])
    ge = g["asof_value"].astype("float64").where(g["asof_value"].notna())
    ee = e["asof_value"].astype("float64").where(e["asof_value"].notna())
    assert ge.fillna(-999).tolist() == ee.fillna(-999).tolist()


def _sessions_ref(rows: list[tuple[int, int]], gap_hours: int) -> set[tuple]:
    """Pure-python gaps-and-islands: break when diff > gap (end-inclusive)."""
    out = []
    by_key: dict[int, list[int]] = {}
    for k, t in rows:
        by_key.setdefault(k, []).append(t)
    for k, ts in by_key.items():
        ts.sort()
        sid, start, prev, n = 1, ts[0], ts[0], 0
        for t in ts:
            if t - prev > gap_hours:
                out.append((k, sid, start, prev, n))
                sid, start, n = sid + 1, t, 0
            prev = t
            n += 1
        out.append((k, sid, start, prev, n))
    return {
        (k, sid, _to_ts(s), _to_ts(e), n) for (k, sid, s, e, n) in out
    }


@given(rows=st.lists(st.tuples(_KEY, _TS), min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_sessionize_matches_reference(spark, rows):
    pdf = pd.DataFrame(
        [
            {"user_id": k, "ts": _to_ts(t), "event_id": i, "value": 1.0}
            for i, (k, t) in enumerate(rows)
        ]
    )
    got = sessionize(
        spark.createDataFrame(pdf), keys=("user_id",), gap="2 hours"
    ).toPandas()
    got_set = {
        (
            r.user_id,
            r.session_id,
            r.session_start.to_pydatetime(),
            r.session_end.to_pydatetime(),
            r.n_events,
        )
        for r in got.itertuples()
    }
    assert got_set == _sessions_ref(rows, gap_hours=2)
