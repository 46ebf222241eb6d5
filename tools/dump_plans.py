import sys, json
sys.path.insert(0, "/root/repo")
from sales_forecast_mlops_at_scale_spark.session import get_spark
from sales_forecast_mlops_at_scale_spark.plans import all_queries

TOP = [
    "q_dedup_clusters", "q_embed_ivf_topk", "q_forecast_7d", "q_train_metrics", "q_train_incremental",
    "q_ab_segments", "q_ab_report", "q_ab_report_full",
    "q_gated_forecast", "q_minhash_incremental", "q_simhash_pairs",
    "q_minhash_dedup", "q_ngram_jaccard", "q_winnow_fingerprint",
    "q_semantic_dedup", "q_kmv_overlap", "q_cms_heavy",
    "q_triangle_stats", "q_dsir_select", "q_lm_quality", "q_bloom_prefilter",
    "q_stratified_sample", "q_pq_topk", "q_ivfpq_topk", "q_cdc_dedup",
    "q_media_phash_pairs", "q_bpe_encode", "q_ann_recall_all",
    "q_ivfpq_search", "q_ivfpq_index_stats", "q_pq_distortion",
    "q_quantile_sketch", "q_train_metrics_summary", "q_gate_rate",
    "q_cv_split_stats", "q_forecast_weekday", "q_rmse_bands",
    "q_erasure_audit", "q_index_drift", "q_adaptive_salted_join",
    "q_feature_matrix", "q_k_anonymity", "q_decayed_counts",
    "q_model_compare", "q_psi_drift", "q_conformal_intervals",
    "q_mondrian_conformal", "q_drift_log", "q_group_skew", "q_index_retrain",
    "q_retrain_decision", "q_stream_late_data", "q_stream_dedup",
    "q_stream_sessions", "q_scd2_merge", "q_stream_attribution",
    "q_stream_outer_attr", "q_stream_chained", "q_stream_latest",
    "q_stream_tws", "q_stream_tws_init", "q_stream_tws_ttl",
    "q_stream_ttl", "q_stream_enrich", "q_ab_welch", "q_ab_cuped",
    "q_ab_quantiles", "q_ingest_merge", "q_partition_prune",
    "q_time_travel", "q_schema_evolution",
]
NOTES = {
    "q_dedup_clusters": "MinHash-LSH pairs (persisted shingle sets, banded bucket join) feed min-label propagation; four steps + one pointer-doubling shortcut per burst ending in one lazy checkpoint whose materialization rides the convergence count; in-burst convergence detection finishes shallow graphs in ONE driver action; deep graphs escalate to large-star/small-star contraction (O(log^2 n) rounds, diameter-independent); edges pinned once.",
    "q_embed_ivf_topk": "Centroid argmax = codegen long-max hash aggregate (partial_max map-side); 2 Lloyd iterations trained on a 50% md5 sample; vectors never ride the assignment shuffle.",
    "q_forecast_7d": "One exchange total: repartition on group keys serves the daily agg AND the batched grouped map (sorted_group_map: partition-sorted MapInPandas, many groups per Arrow batch, trailing-group carry-over); kernel is a numpy LUT matrix per batch with JVM-precomputed __dow/__ord.",
    "q_train_metrics": "Same single-exchange series; walk-forward CV via the batched sorted-partition kernel - per-group Python constant amortized across whole Arrow batches, rows pre-sorted so no per-group argsort.",
    "q_train_incremental": "Fingerprint agg + stale probe reuse the series' key partitioning (the BIG data never reshuffles); only fingerprint-changed groups reach the grouped-map train; quiescent runs are a pure read of the committed metrics generation.",
    "q_gated_forecast": "Fused train->gate->predict in ONE batched grouped pass; rejected groups contribute zero rows to the batch output frame.",
    "q_minhash_incremental": "Asymmetric LSH: batch buckets probe corpus buckets; never corpus x corpus.",
    "q_simhash_pairs": "64-bit votes as map-side-combinable sums; signatures persisted across the bucket self-join; pigeonhole chunk join + bit_count verify.",
    "q_minhash_dedup": "Shingle pipeline runs ONCE (persisted sets feed signature agg + exact verify); banding 16x4.",
    "q_ngram_jaccard": "Pair counting on a hashed inverted index; max_df bar folded in as a broadcast 1-row aggregate; per-doc sizes ride the index rows via window.",
    "q_winnow_fingerprint": "Arrow-batched Karp-Rabin kernel: pure map, zero shuffle; only the per-doc digest rollup aggregates.",
    "q_semantic_dedup": "One shuffle on the cluster key into a grouped GEMM; no vector arrays in any join; a max-aggregate over cluster counts short-circuits the residue-blocked branch when no cluster exceeds the cap (the skew path pays only when skew exists).",
    "q_kmv_overlap": "Per-side distinct-hash reduction, full-outer merge on 8-byte hashes, bottom-k via TakeOrderedAndProject.",
    "q_triangle_stats": "Degree-ordered orientation bounds the wedge join by oriented out-degree (O(sqrt m) even on power-law graphs); wedge closure is an equi-join on the canonical edge; per-vertex rollup is one explode+groupBy; the canonical pair set and degree frame are persisted (4 and 3 consumers - unpersisted they re-executed the MinHash pipeline per consumer).",
    "q_dsir_select": "Two bounded bucket histograms (map-side combinable, <=1024 cells); corpus totals are unbounded-window sums OVER those histograms (r9: the agg-then-crossJoin version re-evaluated each tokenize+histogram subtree twice - the psi_report defect class, caught by tools/scan_audit.py); broadcast log-ratio LUT, one doc-keyed shuffle, TakeOrderedAndProject. 3 scans total - the floor (target pass, raw histogram pass, raw probe pass).",
    "q_lm_quality": "Bigram pairing is a per-row HOF zip (no shuffle); ONE target pass builds the bigram histogram (context counts derive from it, pinned once for its two consumers); smoothing decomposes into cell/context/global broadcast LUT tiers - identical arithmetic to the joined formula, and the probe-restriction pass (a second full raw tokenize) is gone. 3 scans total (r9, was 5).",
    "q_bloom_prefilter": "Build side reduces to <=m distinct bits (one row after collect_list), broadcast; probe pass is per-row HOF membership - zero probe-side shuffle.",
    "q_stratified_sample": "Per-stratum counts broadcast back as integer allocations; one window rank per stratum over the salted hash - a single shuffle keyed by the strata columns.",
    "q_pq_topk": "Lloyd-trained codebook pinned (tiny M*K rows; plan doubles per iteration without the pin), code table pinned as the stored index; ADC = codes x broadcast distance table, integer sums, TakeOrdered-style top-k.",
    "q_ivfpq_topk": "Coarse cosine argmax buckets + residual PQ codes; ADC touches only integer code rows of probed buckets, then top-50 candidates broadcast to the raw-vector table for the exact cosine re-rank (recall@5 0.875 at shipped nprobe=16); index slots keyed EXCLUDING search params; whole search plan memoized driver-side (LRU-bounded, session-checked).",
    "q_ivfpq_search": "The production tier: ADC + exact re-rank against the MATERIALIZED index tables (centroids/codebook/codes/vectors maintained by streaming/vector_ingest) - no training in the plan at all; query-side frames broadcast, corpus side shuffle-free (plan-asserted); the compressed codes tier is persist-pinned (pin_codes=True - PQ's premise is codes-fit-in-memory), slot-keyed on the codes file digest so an ingest append or compaction evicts it.",
    "q_ivfpq_index_stats": "Reads only the materialized assignments tier: one groupBy(bucket) count + a broadcast 1-row total; integer ppm shares. The oracle re-derives the assignment from scratch, so tier drift fails the differential.",
    "q_pq_distortion": "Per-subvector error = min(d_fp) over the BROADCAST codebook (assignment IS the argmin, so no join against the code table); one map-side-combinable (vid, m) aggregation of longs, then a 32-row rollup.",
    "q_quantile_sketch": "Two bounded aggregation passes (per-group min/max/count, then <=bins equi-width cell counts, both map-side combinable) + a bins-sized cumulative window; exact percentile would sort the full column.",
    "q_train_metrics_summary": "The full walk-forward-CV grouped-map job, then a fixed-point (sum-of-scaled-longs) rollup - order-independent, so Spark partial aggregation matches DuckDB serially.",
    "q_gate_rate": "Runs the fused train->gate->predict pipeline AND the train pipeline, rolled up per returnflag with integer counts - the facet exists to put driver-sampleable rows on the U2-U6 family.",
    "q_cv_split_stats": "The CV training grouped-map job reduced to ONE row of integer aggregates (count/sum/min/max) - a global hash aggregate with map-side partials; every per-group error anywhere in the pipeline shifts a sum.",
    "q_forecast_weekday": "Full 7-day forecast grouped-map, then a 7-row integer rollup keyed on ISO weekday - catches horizon-anchor off-by-one errors that permute the weekday lookup.",
    "q_rmse_bands": "CV training job banded by floor(rmse/5) on the shared 4-digit-rounded value - a handful of histogram rows, map-side combinable.",
    "q_cdc_dedup": "Arrow kernel chunking (zero shuffle), then one map-side-combinable digest groupBy - the exact-dedup shape over content-defined chunks.",
    "q_cms_heavy": "Depth x width sketch as one grouped sum per (row,col) cell - map-side combinable grid, heavy-hitter probe reads the broadcast sketch; bounded state regardless of key cardinality.",
    "q_mondrian_conformal": "The weekday-conditional variant rides the SAME single-shuffle sorted-group-map pass; the per-class partitioning happens inside the kernel (numpy mask per weekday), so conditioning costs zero extra shuffles - 7 classes or 700 would plan identically.",
    "q_conformal_intervals": "Split-conformal calibration as the SAME single-shuffle sorted-group-map shape as the trainer: per group the kernel sorts a few-hundred-element residual vector executor-side; nothing but one summary row per group leaves the worker. The coverage audit on the held-out fold rides the same pass.",
    "q_model_compare": "Three-family CV bake-off as ONE sorted-group-map job: the series shuffles once (the reused REPARTITION_BY_COL exchange); the lag_7 feature challenger is a calendar-RANGE Window riding that same exchange, and the grouped map sorts on an ALIAS of the Window's own day index, so Catalyst elides the second per-partition sort - the executed plan is 1 Exchange / 1 Sort / 1 Window / 1 MapInPandas. All three models fit inside the same Arrow batch visit over identical folds; promotion compares the rounded RMSEs both engines share.",
    "q_psi_drift": "ALL features unpivoted (stack) into (feature, x) rows AND the window indicator riding the scan as a computed column (psi_report_split, r11: ref/cur are complementary slices of one table, so w = CASE WHEN pred THEN 0 ELSE 1 replaces the two-branch union) - the whole audit is exactly TWO map-side-combinable passes over ONE lineitem scan each (r8 planned ~8 scans per feature; r9 executed 4 = 2 windows x 2 passes; r11 executes 2, the floor for exact equi-width binning). Window totals and KS cumsums are window sums over the tiny densified bin frame, never a re-aggregation of the un-persisted subtree. PSI terms are 1e-6 fixed-point quantized ln; the KS path is exact-integer CDF numerators.",
    "q_index_drift": "Drift observability over the two-epoch materialized index: reads ONLY the assignments + seed_stats tiers - two tiny groupBy(bucket) hash aggregates (map-side combinable) joined and crossed with a broadcast 1-row totals frame; pure integer ppm arithmetic. The two-epoch index build (train on first half, ingest second half frozen) is digest-memoized OUTSIDE the plan, same convention as the other materialized indexes; the steady-state plan is what a warehouse drift monitor runs per maintenance tick. At 100 TB the scan is bytes per million vectors - vectors and codes never load.",
    "q_adaptive_salted_join": "Probe (TakeOrderedAndProject top-10 key counts + one scalar count) -> ppm threshold -> selective salt: only hot keys fan the build side out x8, cold keys ride salt 0, so the build-side blow-up is O(hot keys), not O(dim rows). Exchange keyed on (user_id, __salt) under a forced shuffle (plan-asserted in tests); result is hash-identical to the plain join (oracle) - the salt never changes semantics, only placement.",
    "q_feature_matrix": "ONE Window operator evaluates ALL five frames (two calendar lags, trailing-28d sum+count, unbounded history count) over ONE Exchange+Sort on the group keys - the same REPARTITION_BY_COL the grouped-map trainer reuses, so feature prep adds zero shuffles to the training pipeline. RANGE frames end at -1 (yesterday): point-in-time correctness is in the frame spec, not in a join.",
    "q_k_anonymity": "All four generalization levels of the QI lattice from ONE Expand + map-side-combined count shuffle (grouping sets); the second aggregate reduces class rows (<= distinct-QI cardinality, never data-scale) to 4 summary rows. Release-audit cost is one scan regardless of lattice width.",
    "q_decayed_counts": "Partial hash agg (map-side combine of the exact shifted-integer numerators) -> one exchange -> TakeOrderedAndProject(50); the anchor is a broadcast 1-row max over a ts-only column-pruned scan. The streaming twin (streaming/decay.py) folds the same integers incrementally - state O(keys x shift), proven bit-equal in tests.",
    "q_erasure_audit": "The governed-copy build (key-clustered write + snapshot-enable + surgical erasure + vacuum) happens ONCE per testdata digest OUTSIDE the query plan (same convention as the materialized ANN index); the recorded plan is the steady state a warehouse audit actually runs - a parquet scan of the erased table into one map-side-combinable hash aggregate. The erasure itself rewrote only the files the IN-list prune + semi-join located (footer-stats pruned on the doc_id clustering the build laid down).",
    "q_drift_log": "The streaming drift monitor's parquet log read back: steady-state plan is a partition-pruned scan of a few-rows-per-trigger log (batch_id= partitions) + one sort. The log itself was appended by run_drift_monitor over a two-epoch file stream - checkpointed, exactly-once via dynamic partition overwrite (a replay drain is pinned byte-identical during the fixture build) - and the oracle re-derives every row from per-epoch batch PSI SQL, so the monitoring path is hash-checked end-to-end, not only pytest-checked.",
    "q_group_skew": "Trainer-keyed group-size audit: one groupBy(keys).count (rides the series' partitioning), reduced to a DISTINCT-size histogram (bounded by the max group size, never the group count) before any single-partition window - the exact p50/p99 order statistics and the integer-ppm largest-group share never move data-scale rows. This is the observability for the one bound salting cannot move: a whole-group kernel's slowest task IS the largest group.",
    "q_index_retrain": "q_index_drift's closure: same assignments+seed_stats-only scan shape, but over the index AFTER the real maintenance tick (maybe_retrain crossed the demo threshold, retrain_index rebuilt quantizers from the full corpus and swapped all five tiers through the crash-healing journal, digest-memoized OUTSIDE the plan). Post-retrain seed_stats IS the live distribution, so the oracle pins drift_ppm = 0 per bucket AND the exact retrained assignment derivation - a stale tier or mixed swap fails the hash.",
    "q_retrain_decision": "The capstone composition: the split-indicator PSI audit (2 lineitem scans, r11) and the three-family bake-off (1 scan) reduced to ONE decision row - 3 scans total, under the default audit bar with the r10 ALLOW entry retired; thresholds compare the exact integer PSI numerator (sum of term_fp longs) and an integer flip ppm - no re-quantized doubles anywhere in the gate.",
    "q_stream_late_data": "Steady state: a scan of the few-rows-per-window log + one sort. The log was appended by the REAL watermarked streaming rollup (append mode, checkpointed) over three deterministic epochs with stragglers; the oracle replays the engine's late-data policy in SQL (row survives iff its window end clears the PREVIOUS batch's watermark; the log holds exactly the windows the final watermark closed; replay drains append nothing - pinned byte-level during the build).",
    "q_stream_dedup": "Steady state: a scan of the emitted-rows log + one sort. dropDuplicatesWithinWatermark driven over one-row-per-(key,epoch) file streams; the oracle unrolls the state machine (first survivor pins expiry at its ts + delay, duplicates do NOT extend it, eviction vs the previous batch's watermark, evicted keys re-emit). Stream state is O(live keys), watermark-bounded.",
    "q_stream_sessions": "Steady state: a scan of the closed-sessions log + one sort. Native session_window aggregate in append mode over band-filtered epochs (rows >= 1 day from epoch edges, so merge-with-open-state coincides with closed-form islands - asserted at build); the oracle is per-user gaps-and-islands cut at the final watermark, so eager emission / closed-session merges / replay double-emits fail the hash. Stream state is O(open sessions), watermark-bounded.",
    "q_scd2_merge": "ONE left join (closed history rides it unmatched - valid_to IS NULL is in the join condition), then each row EXPLODES into its one-or-two output rows (kept, or closed + new version). r9: the filter-three-ways-and-union version re-evaluated the un-persisted join per branch - 6 scans of the dimension; now 2 (the floor).",
    "q_stream_attribution": "Steady state: a scan of the emitted-pairs log + one sort. The log is the REAL two-source stream-stream interval inner join (clicks x purchases within 1h per user, append mode, checkpointed) over three epoch files per side with stragglers; the oracle applies the engine's probed policy on top of the batch join (global min-of-sides watermark late filter at input, left state evicted at imp_ts + max_delay, right at its own event time, one-batch watermark lag). Stream state is O(rows within the watermark horizon).",

    "q_stream_outer_attr": "Steady state: a scan of the outer-join log + one sort. The log is the LEFT OUTER twin: unmatched lefts emit one null-partner row in the drain whose UPDATED watermark passes imp_ts + max_delay (boundary probed exactly); 8h window so policy-caused nulls exist at every SF; lefts inside the horizon withheld.",
    "q_stream_chained": "Steady state: a scan of the period log + one sort. The log is TWO CHAINED stateful aggregates in ONE query (day windows feeding 3-day windows via window_time); the cascade completes within a drain (watermark propagation), so the plan the oracle models is the pure composition of the pinned single-level rules; n_days pins the day-rows each period absorbed.",
    "q_stream_latest": "Steady state: a scan of the upsert log + one sort. Update-mode applyInPandasWithState (running max per key over an LCG-permuted order column) drained through an exactly-once foreachBatch anti-join upsert keyed on (user, epoch-tag); stream state is one (ord, value) pair per key.",
    "q_stream_tws_init": "Steady state: a scan of the upsert log + one max-n window reduction + one sort. The THIRTEENTH stateful differential — TWS handleInitialState, the batch-BOOTSTRAP path (probed r11: the seed applies exactly once per key in the first drain, survives checkpoint resume un-re-applied, and seeded keys with no stream rows emit nothing). The oracle replays history-aggregate + cumulative stream totals per touched epoch; user-class split guarantees boot/silent/late-boot/fresh witnesses at every SF.",
    "q_stream_tws_ttl": "Steady state: a scan of the tiny closed-segment log + one sort. The TWELFTH stateful differential: the TTL activity-segment machine on TWS EventTime TIMERS + typed RocksDB ValueState (registerTimer/deleteTimer/handleExpiredTimer). Probed rules match the classic API exactly, so it shares q_stream_ttl's oracle VERBATIM and the fixture build pins the two machines' logs row-for-row — a cross-API differential on top of the cross-engine one.",
    "q_stream_tws": "Steady state: a scan of the upsert log + one max-n window reduction + one sort. The ELEVENTH stateful differential and the first on Spark 4's transformWithStateInPandas (typed RocksDB ValueState; de-gated r11 by protobuf_compat): per-key running (count, cents-sum) totals in update mode, exact-integer sums, natural key (user, epoch, n) so the log's reduced form is pinned invariant to BOTH micro-batch splits and drain granularity; the oracle replays cumulative totals per touched epoch in SQL.",
    "q_stream_ttl": "Steady state: a scan of the closed-segments log + one sort. Custom EventTimeTimeout state machine (fold/timeout/reopen, probed empirically); stream state is one 4-field struct per LIVE key, bounded by the ttl horizon; RocksDB parity pytest-pinned.",
    "q_stream_enrich": "Steady state: a scan of the segment log + one sort. Stream-static join (per-batch dimension lookup, broadcastable dim) composing with the watermarked rollup; state O(open windows x segments).",
    "q_ab_welch": "One events scan + a 1-row split anchor -> per-user partial aggregates (one user_id exchange) -> ONE wide conditional-aggregate moment row -> closed-form t/df with zero-variance withhold guards (NULL, mirrored in the oracle twin). Overflow safety is ANSI mode's native ARITHMETIC_OVERFLOW raise - the same loud failure as DuckDB; an interim assert_true guard was removed because its conservative bound rejected inputs both engines handle (code-review r10). No per-arm self-join of the un-persisted user frame (the duplicated-subtree class).",
    "q_ab_segments": "Users joined to the broadcastable customer dim once, ONE conditional-aggregate pass per segment; segments with a thin arm (n < 2) or zero pooled variance (se2 = 0) withheld by the same exact predicates the oracle filters on; the overflow assert rides the segment moment rows.",
    "q_ab_report": "The one-pass readout (VERDICT r9 #3): one events scan + 1-row split anchor -> one user_id exchange -> ONE wide moment row -> 16 (stat, metric, value) rows via explode. SRM + Welch + CUPED share the single moment pass an analyst previously paid per statistic.",
    "q_ab_report_full": "The COMPLETE readout (VERDICT r10 #1): the per-user frame is persisted once (events scanned once at materialization + the 1-row split anchor); ONE conditional aggregation computes the moment row AND both arms' R-7 quantile arrays together (order statistics ride the moments' exchange), and per-segment Welch effects pay the one genuinely new exchange (customer dim broadcast). 16 core + 12 quantile + 6-per-segment long-form rows; every value expression identical to the per-statistic operators (pytest-pinned row-for-row).",
    "q_ab_cuped": "Same single moment pass as the t-test; CUPED evaluated in CLOSED FORM from the moments (theta = pooled cov/var), the two output rows exploded from the 1-row frame - no per-user adjusted values anywhere in the plan.",
    "q_ab_quantiles": "One conditional-aggregate pass (percentile over each arm's integer cents); per-level rows exploded from the single aggregate row.",
    "q_ingest_merge": "Steady state: one scan of the date-partitioned ingest table + per-product hash aggregate. The table is the REAL run_stream_ingest output (anti-join MERGE + commit markers) over drains poisoned with intra-batch duplicates and corrupted cross-epoch re-deliveries.",
    "q_partition_prune": "The range bound is a collected 1-row anchor, so the date predicate lands in the scan's PartitionFilters (pytest-asserted) - only matching date= directories are listed; at 100 TB this IS the query.",
    "q_time_travel": "Two manifest-pinned file-list scans (one per version) + per-type hash aggregates; the version catalog is O(versions), never O(data).",
    "q_schema_evolution": "One mergeSchema scan of the mixed-schema file set; the aggregate splits on NULL-ness of the evolved column (old files null-fill).",}

from roundinfo import ROUND, head_commit  # noqa: E402 — shared stamp source

HEAD = head_commit()

spark = get_spark("plans"); spark.sparkContext.setLogLevel("ERROR")
reg = all_queries()
out = [f"# Physical-plan audit (round {ROUND})", "",
       f"Captured at commit `{HEAD}` — the staleness contract (VERDICT r9 #2):",
       "this file documents the SHIPPED plans only if that commit is the last",
       "one touching query/operator code; CHANGES must cite it.  Formatted",
       "`.explain` output for the most expensive bench queries at sf0.001,",
       "captured after execution (AQE-final plans). Regenerate with",
       "`python tools/dump_plans.py` (run AFTER the final code commit).", ""]
for name in TOP:
    df = reg[name].fn(spark, "/root/testdata/sf0.001")
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # trim to the structural skeleton: drop attribute-id noise-heavy long lines
    lines = [l.rstrip() for l in plan.splitlines()]
    skel = [l if len(l) <= 200 else l[:197] + "..." for l in lines[:60]]
    out += [f"## {name}", "", NOTES.get(name, ""), "", "```", *skel]
    if len(lines) > 60:
        out.append(f"... ({len(lines) - 60} more lines)")
    out += ["```", ""]
rest = sorted(set(reg) - set(TOP))
out += [
    "## Allowlisted out (plans not dumped, with reason)",
    "",
    "Every registry query not shown above is one of: a single-scan",
    "relational plan (TPC-H q1-q22, the star/date scaffolding, windowed",
    "rollups) whose shape is visible in its source one-liner; a tiny",
    "broadcast-dim join; or a steady-state log read whose streaming twin",
    "IS dumped above.  All of them pass tools/scan_audit.py (committed",
    "per round), which walks every executed plan tree - so 'not dumped'",
    "never means 'not audited for duplicated scans'.",
    "",
    ", ".join(f"`{n}`" for n in rest),
    "",
]
out_path = f"/root/repo/PLANS_r{ROUND}.md"
open(out_path, "w").write("\n".join(out))
print("wrote", out_path, sum(1 for _ in open(out_path)))
spark.stop()
