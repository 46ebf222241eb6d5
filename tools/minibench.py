"""Targeted bench-parity timer: run ONLY the named queries with exactly
the bench's methodology (count() action, min of reps, clear_slots +
clearCache between queries, first-run reported separately) so a change
can be measured without paying the full 180-query sweep.  Not a
replacement for bench.py — a development loop tool (optimization r13).

Usage: python tools/minibench.py q_a q_b ...
Env: SPARK_GRAFT_SF_DIR (default sf0.1), MINIBENCH_REPS (default 4),
MINIBENCH_JSON (optional output path).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_forecast_mlops_at_scale_spark.cache import clear_slots
from sales_forecast_mlops_at_scale_spark.plans import all_queries
from sales_forecast_mlops_at_scale_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("minibench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    reps = int(os.environ.get("MINIBENCH_REPS", "4"))
    # JVM warm-up on the first target, then clean state (bench.py parity)
    registry[names[0]].fn(spark, SF_DIR).count()
    clear_slots()
    spark.catalog.clearCache()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            registry[name].fn(spark, SF_DIR).count()
            runs.append(time.perf_counter() - t0)
        clear_slots()
        spark.catalog.clearCache()
        out[name] = {"min": round(min(runs), 3), "first": round(runs[0], 3),
                     "runs": [round(r, 3) for r in runs]}
        print(name, out[name], flush=True)
    path = os.environ.get("MINIBENCH_JSON")
    if path:
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
