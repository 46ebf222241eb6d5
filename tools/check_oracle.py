"""Local replica of the driver's DuckDB-differential correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin at the given
sf dir (default sf0.01), compares row count, sorted-column schema, and a
value hash computed the same way the driver does: sort columns by name,
sort rows, hash stringified values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
Set ORACLE_JSON_OUT=<path> to also write the per-query results as a JSON
artifact (committed per round as ORACLE_LOCAL_r{N}.json so the driver-
unsampled queries have a recorded correctness trail).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb
import pandas as pd

from sales_forecast_mlops_at_scale_spark.plans import all_queries
from sales_forecast_mlops_at_scale_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df[sorted(df.columns)]
    # normalize floats to 6 digits, everything to str
    norm = df.copy()
    for c in norm.columns:
        if norm[c].dtype.kind == "f":
            norm[c] = norm[c].round(6)
        norm[c] = norm[c].astype(str)
    rows = sorted(norm.itertuples(index=False, name=None))
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return len(df), list(df.columns), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    results: dict[str, dict] = {}
    for name, qdef in sorted(all_queries().items()):
        if only and name not in only:
            continue
        try:
            sdf = qdef.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            results[name] = {"status": "spark_error", "err": str(e)[:300]}
            failures += 1
            continue
        if qdef.oracle is None:
            print(f"rows {name}: {len(sdf)} rows (no oracle)")
            results[name] = {"status": "rows_only", "spark_rows": len(sdf)}
            continue
        try:
            odf = con.execute(qdef.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            results[name] = {"status": "oracle_error", "err": str(e)[:300]}
            failures += 1
            continue
        sn, sc, sh = _canon(sdf)
        on, oc, oh = _canon(odf)
        ok = (sn, sc, sh) == (on, oc, oh)
        results[name] = {
            "status": "ok" if ok else "mismatch",
            "spark_rows": sn,
            "oracle_rows": on,
            "schema_match": sc == oc,
            "hash_match": sh == oh,
            "hash": sh,
        }
        if ok:
            print(f"OK   {name}: {sn} rows hash={sh}")
        else:
            failures += 1
            print(f"FAIL {name}: spark=({sn},{sc},{sh}) oracle=({on},{oc},{oh})")
    spark.stop()
    out = os.environ.get("ORACLE_JSON_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "failures": failures, "queries": results},
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {out}")
    print(f"{'ALL OK' if not failures else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
