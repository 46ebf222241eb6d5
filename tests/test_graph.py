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


def test_triangle_stats_k4_plus_pendant(spark):
    from sales_forecast_mlops_at_scale_spark.operators.graph import triangle_stats

    # K4 on {1,2,3,4} (4 triangles, each vertex in 3) + pendant 5 on 1
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(1, 5)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = {r.vertex: r for r in triangle_stats(pairs).collect()}
    assert rows[2].degree == 3 and rows[2].triangles == 3
    assert rows[2].clustering == 1.0
    # vertex 1: degree 4, still only the 3 K4-triangles -> 3/(4*3/2) = 0.5
    assert rows[1].degree == 4 and rows[1].triangles == 3
    assert rows[1].clustering == 0.5
    assert rows[5].degree == 1 and rows[5].triangles == 0
    assert rows[5].clustering == 0.0


def test_triangle_stats_orientation_invariance(spark):
    """Degree-ordered orientation must not change counts: compare against
    the naive a<b<c enumeration on a random-ish graph."""
    from itertools import combinations

    from sales_forecast_mlops_at_scale_spark.operators.graph import triangle_stats

    # deterministic pseudo-random graph on 12 vertices
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a in range(12)
            for b in range(12)
            if a != b and (a * 7 + b * 13) % 5 == 0
        }
    )
    eset = set(edges)
    tri_naive = [
        t
        for t in combinations(range(12), 3)
        if (t[0], t[1]) in eset and (t[1], t[2]) in eset and (t[0], t[2]) in eset
    ]
    expect = {}
    for t in tri_naive:
        for v in t:
            expect[v] = expect.get(v, 0) + 1
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.vertex: r.triangles for r in triangle_stats(pairs).collect()}
    got_nonzero = {v: n for v, n in got.items() if n}
    assert got_nonzero == expect


def test_pagerank_broadcast_edges_mode_identical(spark):
    """The r12 broadcast_edges mode (constant edge table as the reused
    broadcast build side) must be rank-for-rank identical to the default
    path — same exact integer recurrence, same left-join densify, only
    the join strategy differs (the union-zero densify variant was
    measured and reverted in r12)."""
    edges = [(0, 1, 3), (1, 2, 2), (2, 3, 5), (3, 0, 1), (1, 0, 7), (4, 0, 2)]
    base = _ranks(spark, edges, iterations=7)
    bcast = _ranks(spark, edges, iterations=7, broadcast_edges=True)
    assert base == bcast
    # node 4 has no in-edges: the densify must still emit it with
    # exactly the damped base mass
    assert 4 in bcast
