"""Declared schemas — the analog of the reference's ``db_tables``.

The reference declares its tables twice: SQLAlchemy models
(``/root/reference/services/airflow/dags/db_utils.py:18-47``) and an explicit
streaming StructType (``spark_streaming.py:57-70``).  Here every canonical
table has exactly one declared StructType; **never** rely on CSV/JSON schema
inference for these (SURVEY.md §1.3).

Type decisions carried over from the reference:

- ``stateholiday`` is **string** end-to-end: the raw CSV mixes int ``0`` with
  ``'0','a','b','c'`` and the producer force-casts to str
  (``kafka_producer.py:29-31``).
- ``schoolholiday`` is declared string (the ORM's type, ``db_utils.py:46``)
  and cast at ingest — the reference had a schema mismatch between its
  streaming StructType and its ORM; we resolve it once, here.
- surrogate ``id`` columns are **long**: at 100 TB an int32 overflows.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Domain tables (mirroring reference rossman_sales / forecast_results)
# ---------------------------------------------------------------------------

#: ``rossman_sales`` — reference services/airflow/dags/db_utils.py:35-47
SALES = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("store", T.IntegerType()),
        T.StructField("dayofweek", T.IntegerType()),
        T.StructField("date", T.DateType()),
        T.StructField("sales", T.IntegerType()),
        T.StructField("customers", T.IntegerType()),
        T.StructField("open", T.IntegerType()),
        T.StructField("promo", T.IntegerType()),
        T.StructField("stateholiday", T.StringType()),
        T.StructField("schoolholiday", T.StringType()),
        T.StructField("productname", T.StringType()),
    ]
)

#: Kafka/JSON streaming payload — reference spark_streaming.py:57-70 (no id;
#: date arrives as 'YYYY-MM-DD' string and is cast at ingest).
SALES_EVENT = T.StructType(
    [
        T.StructField("store", T.IntegerType()),
        T.StructField("dayofweek", T.IntegerType()),
        T.StructField("date", T.StringType()),
        T.StructField("sales", T.IntegerType()),
        T.StructField("customers", T.IntegerType()),
        T.StructField("open", T.IntegerType()),
        T.StructField("promo", T.IntegerType()),
        T.StructField("stateholiday", T.StringType()),
        T.StructField("schoolholiday", T.StringType()),
        T.StructField("productname", T.StringType()),
    ]
)

#: ``forecast_results`` — reference services/airflow/dags/db_utils.py:21-32
FORECAST_RESULTS = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("store", T.IntegerType()),
        T.StructField("productname", T.StringType()),
        T.StructField("forecast_date", T.TimestampType()),
        T.StructField("forecast_sale", T.IntegerType()),
        T.StructField("lower_ci", T.IntegerType()),
        T.StructField("upper_ci", T.IntegerType()),
        T.StructField("model_name", T.StringType()),
        T.StructField("model_version", T.StringType()),
        T.StructField("created_on", T.TimestampType()),
    ]
)

#: Batch forecast request — reference services/forecast-service/app/helpers.py:7-11
FORECAST_REQUEST = T.StructType(
    [
        T.StructField("store_id", T.StringType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("begin_date", T.StringType()),
        T.StructField("end_date", T.StringType()),
    ]
)

#: Per-group training metrics (output of ml.train) — reference logs these to
#: MLflow per model (train_utils.py:117-123); we emit them as a DataFrame.
TRAIN_METRICS = T.StructType(
    [
        T.StructField("store", T.IntegerType()),
        T.StructField("productname", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_splits", T.IntegerType()),
        T.StructField("rmse", T.DoubleType()),
        T.StructField("mape", T.DoubleType()),
        T.StructField("mae", T.DoubleType()),
        T.StructField("medae", T.DoubleType()),
        T.StructField("model_name", T.StringType()),
        T.StructField("model_version", T.StringType()),
    ]
)

#: Per-(store, product, date) forecast rows (output of ml.predict) —
#: reference forecast-service/app/main.py:92-112 response, flattened.
FORECAST_OUTPUT = T.StructType(
    [
        T.StructField("store", T.IntegerType()),
        T.StructField("productname", T.StringType()),
        T.StructField("forecast_date", T.DateType()),
        T.StructField("forecast_sale", T.IntegerType()),
        T.StructField("lower_ci", T.IntegerType()),
        T.StructField("upper_ci", T.IntegerType()),
        T.StructField("model_name", T.StringType()),
        T.StructField("model_version", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver star-schema fixtures (/root/testdata/sf*/ — TESTDATA.md)
# ---------------------------------------------------------------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

#: Multimodal asset table (beyond-reference; media bytes as opaque binary +
#: typed metadata — see operators/llm/multimodal.py).
MEDIA_ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # 'image' | 'audio' | 'video'
        T.StructField("uri", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
