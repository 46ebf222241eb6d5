"""PageRank semantics pinned on hand graphs (the oracle only proves
Spark == DuckDB; these prove both compute the thing called PageRank)."""

from __future__ import annotations

from sales_forecast_mlops_at_scale_spark.operators.graph import SCALE, pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src int, dst int, w int")
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


def test_symmetric_cycle_uniform(spark):
    # 3-cycle with equal weights: every node keeps exactly rank/3
    r = _ranks(spark, [(0, 1, 1), (1, 2, 1), (2, 0, 1)])
    assert len(set(r.values())) == 1
    # integer truncation in base/contrib drifts a few units per step
    assert abs(r[0] - SCALE // 3) <= 2 * 10


def test_sink_heavy_node_ranks_highest(spark):
    # both 0 and 1 point at 2; 2 returns flow only to 0
    r = _ranks(spark, [(0, 2, 1), (1, 2, 1), (2, 0, 1), (0, 1, 1)])
    assert r[2] == max(r.values())
    assert r[1] < r[0] < r[2]


def test_mass_conserved_within_truncation(spark):
    # integer truncation loses <1 unit per edge per iteration; with
    # damping the total stays within iterations * edges of the scale
    edges = [(0, 1, 3), (1, 2, 2), (2, 3, 5), (3, 0, 1), (1, 0, 7)]
    r = _ranks(spark, edges, iterations=10)
    assert abs(sum(r.values()) - SCALE) < 10 * len(edges) + 100


def test_weights_steer_rank(spark):
    # node 0 splits 9:1 between 1 and 2 — node 1 must outrank node 2
    r = _ranks(spark, [(0, 1, 9), (0, 2, 1), (1, 0, 1), (2, 0, 1)])
    assert r[1] > r[2]
