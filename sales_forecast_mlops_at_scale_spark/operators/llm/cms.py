"""Count-min sketch frequency estimation (Cormode & Muthukrishnan 2005).

The sketch is a ``depth × width`` grid of counters; each item increments
one counter per row (bucket = salted hash of the item), and a point query
reads the MIN across rows — an overestimate whose error is bounded by the
collision mass of the emptiest row.  Hashes are md5-derived (salt
``cms{row}:``), so any engine with md5 rebuilds the identical grid and
the DuckDB oracle reproduces every counter digit for digit — the same
determinism-over-HLL trade documented in ``sketches.kmv_distinct``.

Scale shape:

- **Build** is one map-side-combinable groupBy over ``depth×`` the token
  stream into ``depth·width`` cells — bounded state regardless of input
  size, and *mergeable*: sketches of two corpora (or two micro-batches)
  combine by summing cells, which is how this operator would ride a
  streaming aggregation at 100 TB.
- **Point queries** broadcast the tiny cell grid and join candidates on
  (row, bucket) — no corpus-sized shuffle on the query path.
- The heavy-hitters query here probes every distinct token (fine for a
  bounded vocabulary); at open-vocabulary scale the candidate set comes
  from a sample or dictionary, with the sketch unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ...cache import persist_slot


def _bucket(col: Column, row: int, width: int) -> Column:
    """Row-salted md5 bucket in [0, width) — mirrors the oracle's
    ``CAST('0x' || substr(md5('cms{row}:' || v), 1, 15) AS BIGINT) % width``."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{row}:"), col)), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(width))


def cms_sketch(
    df: DataFrame,
    value_col: str,
    *,
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the counter grid: one ``(row, bucket, c)`` tuple per non-empty
    cell.  Mergeable: union two sketches and ``groupBy(row, bucket).sum(c)``.

    With ``weight_col``, each input row contributes that many occurrences
    — the grid is IDENTICAL to hashing the raw stream (a cell's count is
    the sum of its items' counts either way), but building from an
    already-aggregated ``(value, count)`` table makes the hashing stage
    vocab-scale instead of corpus-scale."""
    v = F.col(value_col)
    exploded = df.select(
        *( [F.col(weight_col)] if weight_col else [] ),
        F.posexplode(
            F.array(*[_bucket(v, i, width) for i in range(depth)])
        ).alias("row", "bucket"),
    )
    agg = (
        F.sum(weight_col) if weight_col else F.count(F.lit(1))
    ).alias("c")
    return exploded.groupBy("row", "bucket").agg(agg)


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    *,
    depth: int = 4,
    width: int = 64,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` items by count-min estimate, with the exact count
    alongside (estimate ≥ exact always; equality when the item collides
    with nothing in at least one row).

    Output: ``token, estimate, exact, rank`` — ranked by estimate
    descending, token ascending on ties.
    """
    # ONE corpus-scale pass (the token groupBy); the sketch grid is then
    # built vocab-scale from the weighted counts — cell-for-cell identical
    # to hashing the raw stream, at a fraction of the hashing work.  The
    # vocab-sized count table feeds both the grid and the probe side, so
    # it is persisted (ReuseExchange does not fire across the broadcast
    # boundary); cache lifetime is caller-owned, same contract as
    # jaccard.persist_index.
    cand = persist_slot(
        "cms.cand",
        df.groupBy(F.col(value_col).alias("token")).agg(
            F.count(F.lit(1)).alias("exact")
        ),
    )
    sketch = cms_sketch(cand, "token", depth=depth, width=width, weight_col="exact")
    probes = cand.select(
        "token",
        "exact",
        F.posexplode(
            F.array(*[_bucket(F.col("token"), i, width) for i in range(depth)])
        ).alias("row", "bucket"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("token", "exact")
        .agg(F.min("c").alias("estimate"))
    )
    top = est.orderBy(F.col("estimate").desc(), F.col("token").asc()).limit(k)
    w = Window.orderBy(F.col("estimate").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "token", "estimate", "exact", "rank"
    )
