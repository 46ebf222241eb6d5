"""Cross-join request-matrix builder (SURVEY.md §2.3 J2).

The reference builds the weekly batch-forecast request set with a nested
Python loop on the Airflow worker
(``/root/reference/services/airflow/dags/task_operators.py:85-96``) — a
driver-side O(stores × products) list of dicts shipped as JSON.  Here it is
a relational cross join of two distinct-key frames; both sides are tiny
dimension sets, so Catalyst plans a broadcast nested-loop join with no
shuffle, and the result stays distributed for the downstream grouped-map
predict.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_request_matrix(
    stores: DataFrame,
    products: DataFrame,
    *,
    as_of: _dt.date,
    horizon_days: int = 7,
) -> DataFrame:
    """stores × products × [as_of, as_of + horizon) request window.

    Matches the reference request shape (helpers.py:7-11): string ids and
    ISO begin/end bounds, midnight-truncated (task_operators.py:68-74, F7).
    ``as_of`` is explicit — the reference's ``datetime.now()`` here is its
    main reproducibility hazard (SURVEY.md §7).
    """
    begin = as_of.strftime("%Y-%m-%dT00:00:00Z")
    end = (as_of + _dt.timedelta(days=horizon_days)).strftime("%Y-%m-%dT00:00:00Z")
    store_col = stores.columns[0]
    product_col = products.columns[0]
    return (
        stores.select(F.col(store_col).cast("string").alias("store_id"))
        .crossJoin(F.broadcast(products.select(F.col(product_col).alias("product_name"))))
        .withColumn("begin_date", F.lit(begin))
        .withColumn("end_date", F.lit(end))
    )
