"""Iterative graph algorithms as DataFrame loops: PageRank.

The engine's iterative-computation pattern (the same shape as
``operators/llm/cluster.py``'s label propagation): a driver-side ``for``
loop over a bounded iteration count, each step a join + aggregation the
optimizer plans as ordinary shuffles.  No GraphX/RDDs — rank state is a
(node, rank) DataFrame, edges a (src, dst, w) DataFrame.

Exact integer fixed-point arithmetic
------------------------------------
Classic float PageRank sums per-node contributions, and float addition
is not associative — the result depends on partition/summation order,
which differs run to run and engine to engine.  Instead ranks are scaled
integers (``scale = 1e12``): every step is integer multiply / integer
divide / integer sum, all exact and order-independent, so the iteration
is bit-reproducible on ANY cluster layout and hash-matches a DuckDB
oracle running the identical recurrence (unrolled CTE per iteration).
The truncation introduced by integer division is ≤ 1 ulp of the scale
per edge — i.e. a deterministic 1e-12-grade quantization, far below any
ranking-relevant signal.

    r_0(v)     = scale // N
    r_{k+1}(v) = (15 * (scale // N)) // 100
               + (85 * Σ_{u→v} (r_k(u) * w(u,v)) // W(u)) // 100

(dangling mass is dropped — every node in the intended graphs has
out-edges; the oracle replicates the same convention).

Scale notes: edges (+ out-weight) are persisted — they feed every
iteration, and without the persist each iteration's branch would rescan
and re-join the fact tables.  Each iteration is one shuffle-join of the
rank frame (N rows) against edges plus one groupBy; at web scale you
would checkpoint the rank frame every few iterations to truncate
lineage, exactly as cluster.py does for label propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = 10,
    scale: int = SCALE,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
    persist: bool = True,
) -> DataFrame:
    """(node, rank) after ``iterations`` exact integer PageRank steps over
    weighted ``edges``; rank is the 1e12-scaled integer (sum ≈ scale)."""
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(w).cast("long").alias("w")
    )
    if persist:
        e = e.persist()
    outw = e.groupBy("src").agg(F.sum("w").alias("wout"))
    ew = e.join(outw, "src").select("src", "dst", "w", "wout")
    if persist:
        ew = ew.persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if persist:
        nodes = nodes.persist()
    # node count: a catalog-grade scalar (the init constant needs it on
    # the driver); one tiny job over the persisted node frame
    n = nodes.count()
    init = scale // n
    base = (15 * init) // 100
    ranks = nodes.withColumn("rank", F.lit(init).cast("long"))
    for _ in range(iterations):
        contrib = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank * w DIV wout").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("m"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr("85 * coalesce(m, 0L) DIV 100").cast("long")
            ).alias("rank"),
        )
    return ranks


def pagerank_sql(
    edges_sql: str,
    *,
    iterations: int = 10,
    scale: int = SCALE,
    tail: str | None = None,
) -> str:
    """The identical recurrence as ANSI SQL (DuckDB oracle twin): the
    iteration count is fixed, so the loop is UNROLLED into one chained
    CTE per step — mechanical, generated, and exactly the arithmetic the
    DataFrame loop performs."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        "outw AS (SELECT src, sum(w) AS wout FROM edges GROUP BY 1)",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        f"consts AS (SELECT CAST({scale} // count(*) AS BIGINT) AS init,"
        f" CAST((15 * ({scale} // count(*))) // 100 AS BIGINT) AS base FROM nodes)",
        "r0 AS (SELECT node, (SELECT init FROM consts) AS rank FROM nodes)",
    ]
    for k in range(1, iterations + 1):
        parts.append(
            f"r{k} AS (SELECT n.node, CAST((SELECT base FROM consts)"
            f" + (85 * coalesce(s.m, 0)) // 100 AS BIGINT) AS rank"
            f" FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS node, sum((r.rank * e.w) // o.wout) AS m"
            f" FROM edges e JOIN r{k - 1} r ON r.node = e.src"
            f" JOIN outw o ON o.src = e.src GROUP BY 1) s ON s.node = n.node)"
        )
    final = tail or "SELECT node, rank FROM {r}"
    return ",\n".join(parts) + "\n" + final.format(r=f"r{iterations}")
