"""Scale sweep: run the headline operator families at sf0.001 / sf0.01 /
sf0.1 (100× data range) and record wall-clock scaling into SCALING.md.

The interesting number is the LAST column: wall(sf0.1) / wall(sf0.01) on
10× data.  ≈1 means fixed overhead still dominates at this size; ≤10
means at-worst-linear data scaling; the dedup cascade's sub-quadratic
candidate generation and the ANN tiers' bounded-state training are the
rows to watch — a >10 ratio there would flag a shape that cannot
survive 100 TB.  Per-query state is cleared between runs (slots +
catalog cache), reps=2, min recorded.

Usage: PYTHONPATH=/root/repo python tools/scale_sweep.py
"""

import sys, time

sys.path.insert(0, "/root/repo")

from sales_forecast_mlops_at_scale_spark.cache import clear_slots
from sales_forecast_mlops_at_scale_spark.plans import all_queries
from sales_forecast_mlops_at_scale_spark.session import get_spark

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
QUERIES = [
    "q1_pricing_summary",
    "q9_product_type_profit",
    "q_dedup_exact",
    "q_minhash_dedup",
    "q_dedup_clusters",
    "q_simhash_pairs",
    "q_ngram_jaccard",
    "q_winnow_fingerprint",
    "q_cdc_dedup",
    "q_erasure_audit",
    "q_dsir_select",
    "q_lm_quality",
    "q_bm25_topk",
    "q_embed_topk",
    "q_embed_ivf_topk",
    "q_pq_topk",
    "q_ivfpq_topk",
    "q_train_metrics",
    "q_train_incremental",
    "q_forecast_7d",
    "q_triangle_stats",
    "q_cms_heavy",
    # composite pipelines: eval harness, dedup cascade rollup, leakage audit,
    # and the trained-tokenizer encode path
    "q_ann_recall_all",
    "q_dedup_summary",
    "q_split_leakage",
    "q_bpe_encode",
    # r6 additions: warm materialized-index search, semantic dedup with the
    # short-circuited auto-blocking, the quantile sketch, and the heaviest
    # ML facet (gate-rate runs the train AND fused-gated pipelines)
    "q_ivfpq_search",
    "q_semantic_dedup",
    "q_quantile_sketch",
    "q_gate_rate",
    # skew engineering: salted join (result-invariant vs plain join) and
    # the hot-key diagnostic
    "q_salted_join",
    # r7 additions: the 1-row CV audit facet (full grouped-map train run)
    "q_cv_split_stats",
    "q_hot_keys",
    # r8 additions: centroid-drift observability over the two-epoch index
    # and the probe->threshold->selective-salt adaptive join
    "q_index_drift",
    "q_adaptive_salted_join",
    # r8 additions: privacy release audits (grouping-sets lattice +
    # count-distinct diversity), the exact decayed-counter aggregate,
    # median/MAD anomaly flags, and the point-in-time feature matrix
    # (the widest output of the sweep — full windowed series)
    "q_k_anonymity",
    "q_l_diversity",
    "q_decayed_counts",
    "q_decayed_serving",
    "q_anomaly_mad",
    "q_feature_matrix",
    "q_psi_drift",
    "q_model_compare",
    "q_conformal_intervals",
    "q_retrain_decision",
    "q_mondrian_conformal",
    "q_drift_log",
    "q_group_skew",
    "q_index_retrain",
    "q_stream_late_data",
    "q_stream_dedup",
    "q_stream_sessions",
    "q_stream_attribution",
    "q_stream_outer_attr",
    "q_stream_chained",
    "q_stream_latest",
    "q_stream_ttl",
    "q_stream_enrich",
    "q_ab_srm",
    "q_ab_welch",
    "q_ab_cuped",
    "q_ab_quantiles",
    "q_ab_segments",
    "q_ab_report",
    "q_ingest_merge",
    "q_partition_prune",
    "q_time_travel",
    "q_schema_evolution",
]

#: the heavy families also measured at a SELF-GENERATED sf1 point
#: (tools/make_sf1.py: facts inflated 10× with disjoint key spaces —
#: VERDICT r9 #6).  Two measured decades, not one, back the
#: "at-worst-linear" claim; the sf1 column only makes sense for queries
#: whose inputs the inflation actually grows (documents / embeddings /
#: events / lineitem).
SF1_QUERIES = frozenset({
    "q_dedup_exact",
    "q_minhash_dedup",
    "q_dedup_clusters",
    "q_simhash_pairs",
    "q_ngram_jaccard",
    "q_winnow_fingerprint",
    "q_dedup_summary",
    "q_bpe_encode",
    "q_dsir_select",
    "q_lm_quality",
    "q_triangle_stats",
    "q_cms_heavy",
    "q_embed_topk",
    "q_embed_ivf_topk",
    "q_pq_topk",
    "q_ivfpq_topk",
    "q_ivfpq_search",
    "q_ann_recall_all",
    "q_semantic_dedup",
    "q_train_metrics",
    "q_forecast_7d",
    "q_feature_matrix",
    "q_psi_drift",
    "q_decayed_counts",
    "q_anomaly_mad",
    "q_ab_report",
    "q_split_leakage",
    # NOT q_k_anonymity: its only input (customer) is copied verbatim by
    # make_sf1, so an "sf1" cell would re-measure identical data — a
    # vacuous decade (code-review r10)
})


def governance_sweep(spark) -> list[str]:
    """Measure the governance maintenance passes directly (they mutate
    tables, so they cannot ride the query sweep): wall-clock for
    forget_keys / delete_where / compact / publish+vacuum across the
    three SFs, and — the O(matched files) claim — erasure wall across
    file COUNTS at fixed rows, with the tombstones confined to one
    file's key range, so matched files stay constant while unmatched
    files grow 32×."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from sales_forecast_mlops_at_scale_spark.catalog import load_table
    from sales_forecast_mlops_at_scale_spark.streaming.compact import (
        compact_parquet_table,
    )
    from sales_forecast_mlops_at_scale_spark.streaming.forget import (
        delete_where,
        forget_keys,
    )
    from sales_forecast_mlops_at_scale_spark.streaming.snapshots import (
        enable_snapshots,
        publish_snapshot,
        vacuum_snapshots,
    )

    work = tempfile.mkdtemp(prefix="gov_sweep_")

    def build(sf: str, n_files: int) -> str:
        path = f"{work}/docs-{sf.rsplit('sf', 1)[-1]}-{n_files}-{time.monotonic_ns()}"
        load_table(spark, sf, "documents").repartitionByRange(
            n_files, "doc_id"
        ).sortWithinPartitions("doc_id").write.parquet(path)
        return path

    def timed(fn):
        t0 = time.perf_counter()
        out = fn()
        return time.perf_counter() - t0, out

    lines = [
        "## Governance maintenance",
        "",
        "Direct wall-clock (s) of the mutating maintenance passes over a",
        "key-clustered copy of `documents` (fresh copy per cell — these",
        "mutate).  `forget` erases every 97th doc_id; `delete` removes a",
        "doc_id range; `compact` is the full OPTIMIZE rewrite; `snapshot`",
        "is enable + publish + vacuum.",
        "",
        "| op | sf0.001 | sf0.01 | sf0.1 |",
        "|---|---|---|---|",
    ]
    cells: dict[str, list[str]] = {
        "forget_keys (1/97 of ids)": [],
        "delete_where (id range)": [],
        "compact (full rewrite)": [],
        "snapshot publish+vacuum": [],
    }
    for sf in SFS:
        path = build(sf, 16)
        ids = [
            r[0]
            for r in load_table(spark, sf, "documents")
            .where((F.col("doc_id") % 97) == 0)
            .select("doc_id")
            .collect()
        ]
        w, stats = timed(lambda: forget_keys(spark, path, ids, "doc_id"))
        cells["forget_keys (1/97 of ids)"].append(
            f"{w:.2f} ({stats['files_rewritten']}/{stats['files_total']} files)"
        )
        path2 = build(sf, 16)
        hi = (
            load_table(spark, sf, "documents").agg(F.max("doc_id")).first()[0]
        )
        w, stats = timed(
            lambda: delete_where(
                spark, path2, F.col("doc_id") > hi - hi // 10
            )
        )
        cells["delete_where (id range)"].append(
            f"{w:.2f} ({stats['files_rewritten']}/{stats['files_total']} files)"
        )
        w, _ = timed(
            lambda: compact_parquet_table(spark, path, sort_by=["doc_id"])
        )
        cells["compact (full rewrite)"].append(f"{w:.2f}")

        def snap():
            enable_snapshots(path2)
            publish_snapshot(path2, op="append")
            return vacuum_snapshots(path2, keep_last=1)

        w, _ = timed(snap)
        cells["snapshot publish+vacuum"].append(f"{w:.2f}")
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(path2, ignore_errors=True)
    for op, vals in cells.items():
        lines.append(f"| {op} | " + " | ".join(vals) + " |")

    lines += [
        "",
        "**O(matched files), demonstrated**: same table (sf0.01 rows),",
        "file count swept 8→256 (32×), tombstones confined to ONE file's",
        "key range — matched files stay ~1 while unmatched files grow 32×.",
        "A flat wall (and a flat rewrite count) is the file-surgical",
        "contract: erasure cost follows the MATCHED files, not the table.",
        "",
        "| total files | erase wall (s) | files rewritten | bytes untouched |",
        "|---|---|---|---|",
    ]
    sf = SFS[1]
    hi = load_table(spark, sf, "documents").agg(F.max("doc_id")).first()[0]
    for n_files in (8, 64, 256):
        path = build(sf, n_files)
        # keys inside the FIRST file's range only: files are key-
        # clustered, so matched files ≈ 1 regardless of total count
        span = max(1, (hi + 1) // n_files)
        ids = list(range(0, span, max(1, span // 20)))[:20]
        w, stats = timed(lambda: forget_keys(spark, path, ids, "doc_id"))
        untouched = stats["files_total"] - stats["files_rewritten"]
        lines.append(
            f"| {stats['files_total']} | {w:.2f} |"
            f" {stats['files_rewritten']} | {untouched} files |"
        )
        shutil.rmtree(path, ignore_errors=True)
        print(
            f"gov files={n_files:4d} erase={w:5.2f}s "
            f"rewritten={stats['files_rewritten']}", flush=True,
        )
    lines.append("")
    shutil.rmtree(work, ignore_errors=True)
    return lines


def main() -> None:
    spark = get_spark("scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    reg = all_queries()
    # JVM warm-up
    reg[QUERIES[0]].fn(spark, SFS[0]).count()
    clear_slots()
    spark.catalog.clearCache()

    from make_sf1 import ensure_sf1

    sf1_dir = ensure_sf1(spark)

    def timed_cell(name: str, sf: str) -> float:
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            reg[name].fn(spark, sf).count()
            runs.append(time.perf_counter() - t0)
            # clear BETWEEN reps too: rep 2 must not serve from rep
            # 1's persist slots, or "min of 2" silently reports the
            # warm index-reuse path instead of the cold state the
            # header claims
            clear_slots()
            spark.catalog.clearCache()
        return min(runs)

    rows = []
    for name in QUERIES:
        cells = [timed_cell(name, sf) for sf in SFS]
        sf1 = timed_cell(name, sf1_dir) if name in SF1_QUERIES else None
        rows.append((name, cells, sf1))
        tail = f"  sf1={sf1:6.2f}" if sf1 is not None else ""
        print(
            f"{name:24s} " + "  ".join(f"{c:6.2f}" for c in cells) + tail,
            flush=True,
        )

    lines = [
        "# Scaling sweep (round 10)",
        "",
        "Wall-clock (s, min of 2, per-query cold cache state) for the headline",
        "operator families across a 1000× data range on local[32].  The ratio",
        "columns are 10×-data cost ratios — wall(sf0.1)/wall(sf0.01) and, for",
        "the heavy families, wall(sf1)/wall(sf0.1) over the SELF-GENERATED sf1",
        "decade (tools/make_sf1.py: facts inflated 10× with disjoint key",
        "spaces).  ≈1 ⇒ fixed overhead still dominates, ≤10 ⇒ at-worst-linear",
        "scaling; two measured decades back the claim where one could hide a",
        "knee.  Regenerate: `PYTHONPATH=/root/repo python tools/scale_sweep.py`.",
        "",
        "| query | sf0.001 | sf0.01 | sf0.1 | 10× ratio | sf1 | sf1/sf0.1 |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, cells, sf1 in rows:
        ratio = cells[2] / cells[1] if cells[1] else float("nan")
        if sf1 is not None:
            r1 = sf1 / cells[2] if cells[2] else float("nan")
            tail = f" {sf1:.2f} | {r1:.2f} |"
        else:
            tail = " — | — |"
        lines.append(
            f"| {name} | {cells[0]:.2f} | {cells[1]:.2f} | {cells[2]:.2f} |"
            f" {ratio:.2f} |" + tail
        )
    lines += [
        "",
        "Reading: every row's 10× ratio far below 10 means the plans are",
        "dominated by per-query fixed costs (JVM scheduling, broadcast",
        "construction, codegen) at these sizes — the data-dependent parts",
        "(shuffles keyed by doc/vector id, map-side-combinable sketches,",
        "bucketed candidate joins) grow sub-linearly in wall-clock here and",
        "at-worst-linearly in work, which is the property that transfers to a",
        "1000-executor cluster.  A ratio approaching or exceeding 10 would",
        "flag super-linear candidate generation (the shape the banded/blocked",
        "designs exist to prevent).",
        "",
    ]
    lines += governance_sweep(spark)
    with open("/root/repo/SCALING.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote SCALING.md")
    spark.stop()


if __name__ == "__main__":
    main()
