"""Dump ``explain("formatted")`` for the named queries to text files.

Usage: python tools/dump_query_plans.py OUTDIR SUFFIX q_a q_b ...
Writes OUTDIR/<query>_<SUFFIX>.txt.  Env: SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1).  Run with PYTHONPATH at the tree whose plans you
want (a pristine worktree for "before", the working tree for "after").
"""

from __future__ import annotations

import os
import sys

from sales_forecast_mlops_at_scale_spark.cache import clear_slots
from sales_forecast_mlops_at_scale_spark.plans import all_queries
from sales_forecast_mlops_at_scale_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    for name in names:
        df = registry[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print("wrote", path, flush=True)
        clear_slots()
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
