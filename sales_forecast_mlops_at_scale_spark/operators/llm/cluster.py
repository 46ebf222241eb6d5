"""Connected components over near-duplicate pair graphs — the step that
turns pairwise dedup output (MinHash/SimHash/Jaccard pairs) into
KEEP/DROP decisions: every doc gets the id of its duplicate-cluster
representative (the minimum doc id in its component).

Algorithm: min-label propagation (the relational core of
large-star/small-star):

    label(v) ← min(label(v), min over neighbors u of label(u))

iterated to fixpoint.  Each round is one join + one aggregation —
entirely shuffle-based, no driver-side graph.  Rounds needed =
graph diameter; near-dup clusters are small and dense (diameter ≤ 3-4
in practice), so the loop converges in a handful of rounds.  The
per-round ``count()`` is a 1-row convergence probe, and
``localCheckpoint`` truncates the growing lineage so round N's plan does
not replay rounds 1..N-1.

Deterministic: the fixpoint (min id per component) is unique regardless
of iteration order, so a SQL engine can reproduce it with a recursive
closure — see ``plans/llm_queries._CLUSTER_SQL``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    left: str = "id_a",
    right: str = "id_b",
    *,
    max_iter: int = 20,
) -> DataFrame:
    """Cluster labels for every node appearing in ``pairs``.

    Output: ``doc_id, cluster_id`` where ``cluster_id`` is the minimum
    doc id in the node's connected component.  Nodes not in any pair are
    singletons by definition and are NOT emitted (join the full corpus
    with a coalesce-to-self downstream when a total labeling is needed).
    """
    edges = pairs.select(F.col(left).alias("src"), F.col(right).alias("dst"))
    # Contract: ``pairs`` rows are unique with left < right (every in-repo
    # producer — minhash/simhash/jaccard/neardup — emits exactly that), so
    # the forward and reversed edge sets are disjoint and already unique:
    # no ``distinct()`` needed.  Duplicate edges would only pad the
    # per-round min-aggregation anyway (min is idempotent), but skipping
    # the dedup saves a full shuffle of the edge set per invocation.
    edges = (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        # edges join into EVERY round; without pinning, each round's
        # convergence action would replay the full upstream
        # pair-generation pipeline (measured: MinHash-LSH pairs
        # recomputed ~8× → 4s of the 8s runtime).  Lazy: materialized by
        # the first burst's count, reused by every later burst.
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    def step(lbl: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
        neigh = (
            edges.join(lbl, edges.dst == lbl.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        return lbl.join(neigh, lbl.node == neigh.src, "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias(
                "label"
            ),
            *keep,
        )

    # FOUR propagation steps per driver sync (the log₂-ish unroll for
    # the diameter ≤ 4 clusters near-dup graphs actually produce): each
    # burst is pure plan construction ending in ONE lazy localCheckpoint
    # whose materialization rides the convergence ``count()`` itself —
    # so a burst costs exactly one driver action (previous shape: an
    # EAGER checkpoint + a count = 2 syncs per 2 steps; typical graphs
    # went 6 syncs, now 2).  A step past the fixpoint is a no-op join
    # over an already-stable tiny label frame, so overshooting the
    # diameter inside a burst is cheaper than syncing to find out.
    # ``max_iter`` still bounds total propagation STEPS; the
    # pre-burst label rides along as ``prev`` so the convergence probe
    # is a scan of the just-materialized partitions, not another
    # labels-vs-labels shuffle join.
    burst_len = 4
    steps_done = 0
    while steps_done < max_iter:
        burst = min(burst_len, max_iter - steps_done)
        cur = labels.select("node", "label", F.col("label").alias("prev"))
        for _ in range(burst):
            cur = step(cur, keep=("prev",))
        # lazy checkpoint: lineage truncation + caching happen inside
        # the count() action below — no separate materialization job
        stepped = cur.localCheckpoint(eager=False)
        changed = stepped.filter(F.col("label") != F.col("prev")).count()
        labels = stepped.select("node", "label")
        steps_done += burst
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def dedup_summary(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Corpus-level dedup report from a near-dup pair frame: the numbers
    a pipeline run publishes after the KEEP/DROP pass.

    One row: ``n_docs, n_clusters, n_clustered_docs, n_dropped,
    max_cluster_size, dup_rate``.  ``n_dropped`` = clustered docs minus
    one kept representative per cluster.

    Shape: components → per-cluster counts (partial-aggregated) → two
    scalar aggregates cross-joined (both 1-row, the join is free);
    nothing corpus-sized leaves an aggregate.
    """
    cc = connected_components(pairs)
    per = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.coalesce(F.sum("sz"), F.lit(0)).cast("long").alias("n_clustered_docs"),
        F.coalesce(F.max("sz"), F.lit(0)).cast("long").alias("max_cluster_size"),
    )
    return tot.crossJoin(agg).select(
        "n_docs",
        "n_clusters",
        "n_clustered_docs",
        (F.col("n_clustered_docs") - F.col("n_clusters")).alias("n_dropped"),
        "max_cluster_size",
        F.round(
            (F.col("n_clustered_docs") - F.col("n_clusters"))
            / F.greatest(F.col("n_docs"), F.lit(1)),
            6,
        ).alias("dup_rate"),
    )
