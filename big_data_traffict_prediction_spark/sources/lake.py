"""Sources & sinks (SURVEY.md §2.1).

The reference's storage surface:

- S5  partitioned CSV data lake ``raw/YYYY/MM/DD/traffic_log_{cam}.csv``
  appended row-by-row with a hand-rolled header check
  (``app/services/camera.py:54-86``),
- S9  atomic JSON snapshot via tmp-file + .bak + rename
  (``app/utils.py:443-511``),
- S7/S8 whole-file JSON config/stats loads with schema drift handling
  (``app/utils.py:386-441``),
- S11/S12 JSON↔SQLite migration ETLs (``scripts/migrate_to_sqlite.py``,
  ``scripts/sync_stats_db.py``).

Engine equivalents: partitioned *parquet* with ``partitionBy(year,
month,day)`` (partition pruning replaces the directory-walk), Spark's
output-commit protocol (replaces tmp+rename), schema'd JSON readers
with explicit casts (replaces drift handling), and one-shot
read→write jobs (replace the batched ETLs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import CAMERAS
from ..session import pin_session_conf


def write_partitioned_lake(df: DataFrame, path: str, mode: str = "append") -> None:
    """S5: event-level rows → parquet partitioned by (year, month, day).

    At 100 TB this layout is what makes every date-filtered query in
    §2 a partition-pruned scan instead of a directory walk."""
    (
        df.withColumn("year", F.year("ts"))
        .withColumn("month", F.month("ts"))
        .withColumn("day", F.dayofmonth("ts"))
        .write.mode(mode)
        .partitionBy("year", "month", "day")
        .parquet(path)
    )


def read_lake_day(spark: SparkSession, path: str, year: int, month: int, day: int) -> DataFrame:
    """S6 scan side: the partition predicate prunes to one directory —
    the engine-grade version of the reference's os.listdir loop
    (app/utils.py:329-384)."""
    pin_session_conf(spark)
    df = spark.read.parquet(path)
    return df.filter(
        (F.col("year") == year) & (F.col("month") == month) & (F.col("day") == day)
    )


def write_snapshot(df: DataFrame, path: str) -> None:
    """S9: latest-stats snapshot materialization. ``mode("overwrite")``
    rides Spark's commit protocol — readers never observe a partial
    snapshot, which is exactly what the reference's tmp+bak+rename
    dance hand-rolls (app/utils.py:493-508)."""
    df.write.mode("overwrite").parquet(path)


# -------- S7: camera-config JSON with schema-drift normalization ------

# Raw schema BEFORE normalization: lat/lng arrive as BOTH float and
# string in the reference's shipped config (data/cctv_config.json) —
# read as string, cast once, here, at the edge.
_CAMERAS_RAW = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("lat", T.StringType()),
        T.StructField("lng", T.StringType()),
        T.StructField("mirror_id", T.StringType()),
    ]
)


def read_cameras_json(spark: SparkSession, path: str) -> DataFrame:
    """S7: schema'd JSON read + one-place normalization of the mixed
    lat/lng types (SURVEY.md §7 watch-list 6)."""
    pin_session_conf(spark)
    raw = spark.read.schema(_CAMERAS_RAW).json(path)
    return raw.select(
        "id",
        "name",
        "url",
        "active",
        F.col("lat").cast("double").alias("lat"),
        F.col("lng").cast("double").alias("lng"),
        "mirror_id",
    )


def cameras_schema() -> T.StructType:
    return CAMERAS


def migrate_json_history(spark: SparkSession, json_path: str, parquet_path: str) -> int:
    """S11: JSON history → parquet fact table in one declarative job —
    the reference streams dicts into 1000-row INSERT batches
    (scripts/migrate_to_sqlite.py:57-63); Spark's writer batches and
    parallelizes on its own. Returns rows migrated."""
    pin_session_conf(spark)
    schema = T.StructType(
        [
            T.StructField("camera_id", T.StringType()),
            T.StructField("ts", T.DoubleType()),
            T.StructField("count", T.LongType()),
            T.StructField("cars", T.LongType()),
            T.StructField("motors", T.LongType()),
            T.StructField("new_count", T.LongType()),
            T.StructField("new_cars", T.LongType()),
            T.StructField("new_motors", T.LongType()),
        ]
    )
    df = spark.read.schema(schema).json(json_path)
    out = df.select(
        "camera_id",
        F.timestamp_micros((F.col("ts") * 1_000_000).cast("long")).alias("ts"),
        F.col("count").alias("total_count"),
        F.col("cars").alias("car_count"),
        F.col("motors").alias("motorcycle_count"),
        "new_count",
        "new_cars",
        "new_motors",
    )
    out.write.mode("overwrite").parquet(parquet_path)
    return spark.read.parquet(parquet_path).count()
