"""SURVEY.md §2.10 query set, realized on the driver's star-schema fixtures
per the FIXTURES.md §6 mapping.  Every query here has a DuckDB oracle.

Determinism rules (SURVEY.md §5): fixed ``as_of`` (no ``now()``), explicit
tie-breakers on every ranking/limit, floats rounded in-query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import (
    date_scaffold,
    forecast_error_metrics,
    latest_per_key,
    rebase_dates,
    top_n_per_group,
)
from ..schemas import EVENTS
from ..session import FIXED_CLOCK
from . import QueryDef

AS_OF = FIXED_CLOCK.as_of  # 2026-01-01
EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


# -- Q-distinct (A1/A2): distinct dimension values ---------------------------


def q_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customer market segments (ref: db_utils.py:63-68 A1)."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


def q_distinct_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select("o_orderpriority").distinct()


# -- Q-lastdays (P10): date-range predicate over the fact table --------------


def q_lastdays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem rows shipped within 30 days of the newest shipment.

    Ref: training-service/app/db_utils.py:26-31 ("last N days" pull).  The
    anchor max() is a scalar subquery: Catalyst turns it into a 1-row
    broadcast; the ≥ predicate then pushes into the parquet scan (and would
    partition-prune a date-partitioned table).
    """
    li = load_table(spark, sf_dir, "lineitem")
    mx = li.agg(F.max("l_shipdate").alias("__mx"))
    return (
        li.join(F.broadcast(mx))
        .filter(F.col("l_shipdate") >= F.col("__mx") - F.expr("interval 30 days"))
        .drop("__mx")
    )


# -- Q-topn-recent (O2): global top-k by recency -----------------------------


def q_topn_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 orders by recency (ref: db_utils.py:32-37 order_by+limit).

    Spark plans TakeOrderedAndProject: per-partition top-k then a k-row
    merge on the driver — no global sort of the fact table.
    """
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
        .limit(100)
    )


# -- Q-group-slice (P8+O1): conjunctive filter + sort ------------------------


def q_group_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One (l_suppkey, l_returnflag) group's rows, time-ordered.

    Ref: train_utils.py:64-69 (per-group filter feeding a model fit).
    Both predicates push to the scan (PushedFilters).
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_suppkey") == 1) & (F.col("l_returnflag") == "R"))
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    )


# -- Q-latest-per-key (J1/W1): newest row per key ----------------------------


def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-event_id row per (user_id, event_type, day) — window rewrite of
    the reference's GROUP-BY-MAX self-join (web-ui/db_utils.py:40-62)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_day", F.col("ts").cast("date")
    )
    return latest_per_key(
        ev, ["user_id", "event_type", "event_day"], "event_id"
    ).select("user_id", "event_type", "event_day", "event_id", "value")


# -- Q-last7-per-group (W2): top-n per group ---------------------------------


def q_last7_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last 7 events per user — every group in one shuffle (vs the
    reference's per-group SQL roundtrip, web-ui/db_utils.py:70-71)."""
    ev = load_table(spark, sf_dir, "events")
    return top_n_per_group(
        ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()], 7
    ).select(*EVENT_COLS)


# -- Q-cross (J2): request matrix --------------------------------------------


def q_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct nations × distinct brands + fixed 7-day request window
    (ref: task_operators.py:77-96).  Broadcast nested-loop join; both
    sides are post-aggregation dimension sets."""
    nations = load_table(spark, sf_dir, "nation").select("n_name").distinct()
    brands = load_table(spark, sf_dir, "part").select("p_brand").distinct()
    return (
        nations.crossJoin(F.broadcast(brands))
        .withColumn("begin_date", F.lit(AS_OF.strftime("%Y-%m-%dT00:00:00Z")))
        .withColumn("end_date", F.lit("2026-01-08T00:00:00Z"))
    )


# -- Q-rebase (F13): relative-date rebasing ----------------------------------


def q_rebase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift event days so max(day) = as_of - 1 (ref:
    put_data_in_postgres.py:40-47, done there with row-wise lambdas)."""
    ev = load_table(spark, sf_dir, "events")
    return rebase_dates(ev, "ts", as_of=AS_OF, out_col="rebased_date").select(
        "event_id", "rebased_date"
    )


# -- Q-metrics (A6): grouped error aggregates --------------------------------


def q_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RMSE/MAPE/MAE/MedAE of (value, lag-1 value) per event_type —
    sklearn-on-driver in the reference (train_utils.py:38-53), distributed
    partial aggregation here."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    lagged = ev.withColumn("yhat", F.lag("value", 1).over(w)).filter(
        F.col("yhat").isNotNull()
    )
    return forecast_error_metrics(lagged, ["event_type"], y_col="value", yhat_col="yhat")


# -- Q-dateindex (F9): per-group daily scaffold ------------------------------


def q_dateindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-day daily scaffold from each priority class's first order date
    (ref: forecast-service/helpers.py:29-30 pd.date_range per request)."""
    first = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.min(F.col("o_orderdate").cast("date")).alias("__mn"))
    )
    return date_scaffold(
        first, F.col("__mn"), F.date_add(F.col("__mn"), 7), out_col="scaffold_date"
    ).select("o_orderpriority", "scaffold_date")


# -- Q-ingest (S3+P1-P3): JSON serialize → parse with declared schema --------


def q_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON lines → ``from_json`` with the declared schema →
    flatten (ref: spark_streaming.py:71-76).  Batch twin of the streaming
    parse chain; streaming/ingest.py applies the same transform to a
    ``readStream`` frame.

    ``ts`` is formatted explicitly at micro precision: ``to_json``'s
    default timestamp format truncates to millis, which would corrupt the
    roundtrip.
    """
    ev = load_table(spark, sf_dir, "events")
    payload = ev.select(
        F.to_json(
            F.struct(
                F.col("event_id"),
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
                F.col("user_id"),
                F.col("event_type"),
                F.col("value"),
                F.col("props"),
            )
        ).alias("value")
    )
    parse_schema = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )
    parsed = (
        payload.select(F.col("value").cast("string").alias("__json"))
        .select(F.from_json("__json", parse_schema).alias("data"))
        .select("data.*")
    )
    return parsed.withColumn("ts", F.col("ts").cast("timestamp_ntz")).select(*EVENT_COLS)


_ = EVENTS  # declared-schema twin used by streaming ingest (schemas.py)

# -- P13: existence validation (semi-join referential check) -----------------


def q_exists_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13 existence validation: per order priority, how many orders
    reference an existing customer (LEFT SEMI probe of the dimension) and
    how many are orphans.  Mirrors the reference's pre-insert "does the
    store/product exist" checks (SURVEY.md §2.2 P13) as one set-based
    pass — the dimension side is broadcast, so the probe adds no shuffle
    of the fact table."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    total = orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))
    valid = (
        orders.join(
            F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_valid"))
    )
    return (
        total.join(valid, "o_orderpriority", "left")
        .select(
            "o_orderpriority",
            "n_orders",
            F.coalesce("n_valid", F.lit(0)).alias("n_valid"),
            (F.col("n_orders") - F.coalesce("n_valid", F.lit(0))).alias("n_orphans"),
        )
    )


_EXISTS_SQL = """
WITH t AS (SELECT o_orderpriority, count(*) AS n_orders FROM orders GROUP BY 1),
v AS (SELECT o_orderpriority, count(*) AS n_valid FROM orders
      WHERE EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
      GROUP BY 1)
SELECT t.o_orderpriority, t.n_orders,
       coalesce(v.n_valid, 0) AS n_valid,
       t.n_orders - coalesce(v.n_valid, 0) AS n_orphans
FROM t LEFT JOIN v USING (o_orderpriority)
"""


QUERIES: dict[str, QueryDef] = {
    "q_exists_check": QueryDef(q_exists_check, _EXISTS_SQL),
    "q_distinct_segments": QueryDef(
        q_distinct_segments,
        "SELECT DISTINCT c_mktsegment FROM customer",
    ),
    "q_distinct_priorities": QueryDef(
        q_distinct_priorities,
        "SELECT DISTINCT o_orderpriority FROM orders",
    ),
    "q_lastdays": QueryDef(
        q_lastdays,
        "SELECT * FROM lineitem "
        "WHERE l_shipdate >= (SELECT max(l_shipdate) FROM lineitem) - INTERVAL 30 DAY",
    ),
    "q_topn_recent": QueryDef(
        q_topn_recent,
        "SELECT * FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 100",
    ),
    "q_group_slice": QueryDef(
        q_group_slice,
        "SELECT * FROM lineitem WHERE l_suppkey = 1 AND l_returnflag = 'R' "
        "ORDER BY l_shipdate, l_orderkey, l_linenumber",
    ),
    "q_latest_per_key": QueryDef(
        q_latest_per_key,
        "SELECT user_id, event_type, event_day, event_id, value FROM ("
        "  SELECT user_id, event_type, CAST(ts AS DATE) AS event_day, event_id, value,"
        "         row_number() OVER (PARTITION BY user_id, event_type, CAST(ts AS DATE)"
        "                            ORDER BY event_id DESC) AS rn"
        "  FROM events) WHERE rn = 1",
    ),
    "q_last7_per_group": QueryDef(
        q_last7_per_group,
        "SELECT event_id, ts, user_id, event_type, value, props FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY user_id"
        "                               ORDER BY ts DESC, event_id DESC) AS rn"
        "  FROM events) WHERE rn <= 7",
    ),
    "q_cross": QueryDef(
        q_cross,
        "SELECT n_name, p_brand,"
        " '2026-01-01T00:00:00Z' AS begin_date, '2026-01-08T00:00:00Z' AS end_date"
        " FROM (SELECT DISTINCT n_name FROM nation),"
        "      (SELECT DISTINCT p_brand FROM part)",
    ),
    "q_rebase": QueryDef(
        q_rebase,
        "SELECT event_id,"
        " CAST(ts AS DATE) + CAST(datediff('day',"
        "   (SELECT max(CAST(ts AS DATE)) FROM events), DATE '2025-12-31') AS INTEGER)"
        "   AS rebased_date"
        " FROM events",
    ),
    "q_metrics": QueryDef(
        q_metrics,
        "WITH lagged AS ("
        "  SELECT event_type, value AS y,"
        "         lag(value) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS yhat"
        "  FROM events)"
        " SELECT event_type,"
        "   round(sqrt(avg((y-yhat)*(y-yhat))), 4) AS rmse,"
        "   round(avg(abs((y-yhat)/nullif(y, 0))), 4) AS mape,"
        "   round(avg(abs(y-yhat)), 4) AS mae,"
        "   round(median(abs(y-yhat)), 4) AS medae,"
        "   count(*) AS n_pairs"
        " FROM lagged WHERE yhat IS NOT NULL GROUP BY event_type",
    ),
    "q_dateindex": QueryDef(
        q_dateindex,
        "SELECT o_orderpriority, CAST(d AS DATE) AS scaffold_date FROM ("
        "  SELECT o_orderpriority,"
        "         unnest(generate_series(mn, mn + INTERVAL 7 DAY, INTERVAL 1 DAY)) AS d"
        "  FROM (SELECT o_orderpriority, CAST(min(o_orderdate) AS DATE) AS mn"
        "        FROM orders GROUP BY o_orderpriority))",
    ),
    "q_ingest": QueryDef(
        q_ingest,
        "SELECT event_id, ts, user_id, event_type, value, props FROM events",
    ),
}
