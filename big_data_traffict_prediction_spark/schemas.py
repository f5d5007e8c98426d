"""Explicit schemas — single source of truth (SURVEY.md §1.3).

The reference's schema lives in three inconsistent places (SQLite DDL
``app/database.py:18-30``, ad-hoc JSON documents, CSV headers
``app/services/camera.py:73-84``); we centralize every schema here.

Two families:

1. the driver-generated TPC-H-ish testdata tables (TESTDATA.md),
2. the reference-shaped domain tables (``traffic_history``,
   ``cameras``, ``thresholds``, ``detections``) that our operators are
   defined over; at test time these are *views* derived from testdata.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Driver testdata tables (all parquet; names are the DuckDB view names too).
# --------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = list(TESTDATA_SCHEMAS)

# --------------------------------------------------------------------------
# Reference-shaped domain schemas (SURVEY.md §1.2).
# --------------------------------------------------------------------------

# traffic_history: reference app/database.py:18-30. Counts widened to
# LongType (100 TB design: int32 overflows), REAL epoch replaced by a
# proper TimestampType with `id` retained for deterministic tie-breaks.
TRAFFIC_HISTORY = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("camera_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("total_count", T.LongType()),
        T.StructField("car_count", T.LongType()),
        T.StructField("motorcycle_count", T.LongType()),
        T.StructField("new_count", T.LongType()),
        T.StructField("new_cars", T.LongType()),
        T.StructField("new_motors", T.LongType()),
    ]
)

# cameras: reference data/cctv_config.json via app/utils.py:386-394.
# lat/lng ship as BOTH float and string in the reference's JSON —
# normalized to DoubleType at the edge (SURVEY.md §7 watch-list 6).
CAMERAS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lng", T.DoubleType()),
        T.StructField("mirror_id", T.StringType()),
    ]
)

# thresholds: reference scripts/analyze_thresholds.py:55-60.
THRESHOLDS = T.StructType(
    [
        T.StructField("camera_id", T.StringType(), False),
        T.StructField("p50", T.DoubleType()),
        T.StructField("p75", T.DoubleType()),
        T.StructField("p90", T.DoubleType()),
        T.StructField("max", T.LongType()),
    ]
)

# detections: normalized data-lake row (reference
# app/services/camera.py:73-84; bbox is a native array here, not the
# reference's stringified "[x1, y1, x2, y2]").
DETECTIONS = T.StructType(
    [
        T.StructField("timestamp", T.DoubleType(), False),
        T.StructField("source_id", T.StringType(), False),
        T.StructField("source_name", T.StringType()),
        T.StructField("class_id", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("bbox", T.ArrayType(T.IntegerType())),
        T.StructField("year", T.IntegerType()),
        T.StructField("month", T.IntegerType()),
        T.StructField("day", T.IntegerType()),
    ]
)

# multimodal: opaque binary payload + typed metadata (north-star
# extension; no analog in the reference).
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)
