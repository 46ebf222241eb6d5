"""Third-decade scaling probe for the three RISING-ratio queries
(VERDICT r10 #2): q_train_metrics 1.82 → 3.50, q_forecast_7d
1.74 → 3.12, q_split_leakage 2.02 → 3.09 across the first two measured
decades — still far under the linear bar of 10, but a trend that
doubles per decade would cross it two decades out, exactly where 100 TB
lives.

This measures the THIRD decade (sf10: lineitem ≈ 60 M rows / ~111 k
training groups; documents ≈ 100 disjoint isomorphic corpora — see
``make_sf1.ensure_sf10``) and ATTRIBUTES each wall by timing the
query's JVM-side pre-aggregation alone:

- trainer family: ``demand_series().count()`` — the scan + single
  exchange + daily agg; the remainder is the Arrow grouped-map layer
  (per-group Python kernel + batch marshalling);
- split leakage: ``ngram_jaccard_pairs().count()`` — the inverted-index
  pair search; the remainder is the split-expression crossing.

Prints a markdown table ready for SCALING.md.  Run:
``PYTHONPATH=/root/repo python tools/scale_third_decade.py``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from make_sf1 import ensure_sf1, ensure_sf10  # noqa: E402

from sales_forecast_mlops_at_scale_spark.cache import clear_slots  # noqa: E402
from sales_forecast_mlops_at_scale_spark.plans import all_queries  # noqa: E402
from sales_forecast_mlops_at_scale_spark.session import get_spark  # noqa: E402

QUERIES = ("q_train_metrics", "q_forecast_7d", "q_split_leakage")


def _timed(fn, reps: int = 2) -> float:
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return round(min(walls), 2)


def _series_wall(spark, sf_dir: str) -> float:
    from sales_forecast_mlops_at_scale_spark.plans.ml_queries import (
        demand_series,
    )

    return _timed(lambda: demand_series(spark, sf_dir).count())


def _pairs_wall(spark, sf_dir: str) -> float:
    from pyspark.sql import functions as F  # noqa: F401

    from sales_forecast_mlops_at_scale_spark.catalog import load_table
    from sales_forecast_mlops_at_scale_spark.operators.llm.jaccard import (
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")

    def run():
        n = ngram_jaccard_pairs(docs, threshold=0.5, max_df_frac=0.1).count()
        clear_slots()
        spark.catalog.clearCache()
        return n

    return _timed(run)


def main() -> None:
    spark = get_spark("scale-3rd-decade")
    spark.sparkContext.setLogLevel("ERROR")
    reg = all_queries()

    print("building/locating sf1 + sf10 fixtures...", flush=True)
    sf1 = ensure_sf1(spark)
    sf10 = ensure_sf10(spark)
    print(f"sf1={sf1}\nsf10={sf10}", flush=True)

    rows = []
    for name in QUERIES:
        per_sf = {}
        for tag, d in (("sf1", sf1), ("sf10", sf10)):
            def run():
                reg[name].fn(spark, d).count()
                clear_slots()
                spark.catalog.clearCache()

            total = _timed(run)
            if name in ("q_train_metrics", "q_forecast_7d"):
                pre = _series_wall(spark, d)
                layer = "grouped-map (Arrow kernel + marshal)"
            else:
                pre = _pairs_wall(spark, d)
                layer = "split crossing"
            per_sf[tag] = (total, pre, max(total - pre, 0.0))
            print(
                f"{name}@{tag}: total={total}s pre_agg={pre}s "
                f"{layer}={per_sf[tag][2]:.2f}s",
                flush=True,
            )
        t1, p1, k1 = per_sf["sf1"]
        t10, p10, k10 = per_sf["sf10"]
        rows.append(
            (name, t1, t10, round(t10 / t1, 2), p1, p10, round(k1, 2),
             round(k10, 2),
             round(k10 / k1, 2) if k1 > 0 else float("nan"))
        )

    print("\n| query | sf1 | sf10 | sf10/sf1 | pre-agg sf1 | pre-agg sf10 "
          "| kernel sf1 | kernel sf10 | kernel ratio |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(str(x) for x in r) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
