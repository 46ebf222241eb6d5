"""Repo-wide duplicated-scan audit: for EVERY registry query, walk the
executed (AQE-final) physical-plan TREE and count how many times it
scans each parquet source, then flag queries whose per-source scan
multiplicity exceeds a reviewed allowance.

Motivation: the r8 judge found `psi_report` re-evaluating its whole
union+binning subtree because an un-persisted frame was aggregated twice
(crossJoin of `bc.agg(...)` back onto `bc`) — a defect class invisible
to correctness tests and easy to reintroduce.  This mechanizes the check
the judge did by hand, for all queries, every round.

Counting rules (the tree walk, not the plan TEXT — toString reprints a
cached subtree at every reference, which overcounts by orders of
magnitude):

- ``AdaptiveSparkPlanExec`` / query-stage wrappers are unwrapped;
- ``ReusedExchangeExec`` counts 0 (the original exchange site already
  counted its subtree once — reuse is the OPPOSITE of a duplicated
  subtree);
- ``InMemoryTableScanExec`` recurses into its cached plan ONCE per
  distinct relation (a persisted frame's source scan happens once at
  materialization no matter how many consumers);
- scalar-subquery plans (broadcast 1-row anchors) are included.

Output: SCAN_AUDIT_r{N}.md.  Run:
``PYTHONPATH=/root/repo python tools/scan_audit.py``.
"""

import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

from sales_forecast_mlops_at_scale_spark.cache import clear_slots
from sales_forecast_mlops_at_scale_spark.plans import all_queries
from sales_forecast_mlops_at_scale_spark.session import get_spark

from roundinfo import ROUND  # noqa: E402 — shared per-round stamp source

SF = "/root/testdata/sf0.001"
BAR = 4  # scans of one source above this need a documented reason

#: query → (max allowed scans of any ONE source, reason).  Every entry
#: is a REVIEWED exception, not a mute button.
ALLOW = {
    # EMPTY as of r11 — every query rides the default BAR.  History of
    # retired entries (each cut by a plan fix, never by raising the bar):
    # - q_ann_recall_all 12 → 2 (r10: shared prepared-corpus/query
    #   persist, VERDICT r9 #7); q_ivfpq_topk 10 → 3, q_ann_recall
    #   6 → 2, q_hybrid_rrf 6 → 3 (r10 second pass: corpus + token-index
    #   pins)
    # - q_retrain_decision 5 → 3 (r11: psi_report_split rides the window
    #   indicator on ONE lineitem scan, so the PSI audit pays exactly the
    #   2-pass equi-width floor instead of 2 passes x 2 window branches;
    #   + the single-scan 3-way bake-off — VERDICT r10 #4)
}


_jvm = None  # set in main()/callers before walking plans


def _scan_counts(df) -> Counter:
    global _jvm
    if _jvm is None:
        _jvm = df.sparkSession._jvm
    counts: Counter = Counter()
    seen_caches: set = set()

    def walk(p) -> None:
        name = p.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(p.executedPlan())
            return
        if name in (
            "ShuffleQueryStageExec",
            "BroadcastQueryStageExec",
            "TableCacheQueryStageExec",
            "ResultQueryStageExec",
        ):
            walk(p.plan())
            return
        if name == "ReusedExchangeExec":
            return
        if name == "InMemoryTableScanExec":
            rel = p.relation()
            # two references to ONE cache carry re-aliased outputs, so
            # structural hashCode differs — key by the shared
            # CachedRDDBuilder's identity (one materialization, one count)
            try:
                key = _jvm.java.lang.System.identityHashCode(
                    rel.cacheBuilder()
                )
            except Exception:  # noqa: BLE001 — builder API drift
                key = rel.hashCode()
            if key not in seen_caches:
                seen_caches.add(key)
                walk(rel.cachedPlan())
            return
        if name == "FileSourceScanExec":
            try:
                loc = p.metadata().get("Location").get()
            except Exception:  # noqa: BLE001 — metadata shape drift
                loc = "?"
            m = re.search(r"\[[^\]]*?([^/\[\],]+/[^/\[\],]+|[^/\[\],]+)\]?$", loc)
            src = m.group(1) if m else loc
            # keep the last two path components: fixture tiers like
            # {index}/codes vs {index}/centroids are DIFFERENT sources
            parts = [p for p in re.split(r"[/\],]", loc) if p]
            if len(parts) >= 2 and not parts[-1].endswith(".parquet"):
                src = "/".join(parts[-2:])
            elif parts:
                src = parts[-1]
            counts[src[:70]] += 1
            return
        try:
            sq = p.subqueries()
            for i in range(sq.size()):
                walk(sq.apply(i))
        except Exception:  # noqa: BLE001 — not all nodes expose subqueries
            pass
        ch = p.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return counts


def main() -> None:
    spark = get_spark("scan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = all_queries()
    rows = []
    flagged = []
    for name in sorted(reg):
        df = reg[name].fn(spark, SF)
        df.count()
        counts = _scan_counts(df)
        clear_slots()
        spark.catalog.clearCache()
        worst = max(counts.values(), default=0)
        allowed, reason = ALLOW.get(name, (BAR, ""))
        status = "ok"
        if worst > allowed:
            status = "FLAG"
            flagged.append((name, dict(counts), allowed, reason))
        rows.append((name, dict(counts), worst, status, reason))

    out = [
        f"# Duplicated-scan audit (round {ROUND})",
        "",
        "Per-source parquet-scan multiplicity from a WALK of the executed",
        f"(AQE-final) plan tree, for every registry query at {SF}.",
        f"A source scanned more than {BAR}× needs a reviewed reason (ALLOW",
        "list in tools/scan_audit.py) — the r8 psi_report defect (an",
        "un-persisted frame re-aggregated, doubling its whole upstream",
        "subtree) is exactly the class this catches.  Cached frames count",
        "their source scan ONCE (materialization), ReusedExchange counts 0.",
        "Regenerate: `PYTHONPATH=/root/repo python tools/scan_audit.py`.",
        "",
    ]
    if flagged:
        out += ["## FLAGGED (above the reviewed allowance)", ""]
        for name, counts, allowed, reason in flagged:
            out.append(
                f"- **{name}**: {counts} (allowed {allowed}; "
                f"{reason or 'no reason on file'})"
            )
        out.append("")
    else:
        out += ["**No query exceeds its reviewed scan allowance.**", ""]
    out += [
        "## Per-query scan counts",
        "",
        "| query | scans per source | worst | status |",
        "|---|---|---|---|",
    ]
    for name, counts, worst, status, reason in rows:
        pretty = (
            ", ".join(f"{k}:{v}" for k, v in sorted(counts.items()))
            or "(no parquet scan — materialized fixture / memory source)"
        )
        note = f" ({reason})" if reason and worst > BAR else ""
        out.append(f"| {name} | {pretty} | {worst} | {status}{note} |")
    path = f"/root/repo/SCAN_AUDIT_r{ROUND}.md"
    open(path, "w").write("\n".join(out) + "\n")
    print(f"wrote {path}; flagged={len(flagged)}")
    spark.stop()


if __name__ == "__main__":
    main()
