"""MLlib traffic forecasting (SURVEY.md §7 phase 4; BASELINE.json
"Spark MLlib pipelines" north star).

The reference "predicts" by replaying the historical average for a
(dow, hour) slot (app/database.py:109-145). Here the same training
data — per (camera, date, hour) volumes — feeds an MLlib Pipeline
(one-hot dow/hour/camera → LinearRegression), which generalizes the
replay: with only categorical features it converges toward the same
slot means, and it extends to richer features without changing shape.

Model training is iterative/driver-coordinated → no SQL oracle
(rows-only driver check); tests compare its predictions against the
pattern-replay baseline instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import dow0
from ..registry import register
from ..tables import traffic_history


def training_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(camera_id, dow, hour_of_day, d, hourly_total) — the same daily
    slot sums the pattern-replay prediction averages over."""
    h = traffic_history(spark, sf_dir)
    return (
        h.groupBy(
            "camera_id",
            dow0("ts").alias("dow"),
            F.hour("ts").alias("hour_of_day"),
            F.to_date("ts").alias("d"),
        )
        .agg(F.sum("new_count").cast("double").alias("hourly_total"))
    )


@register("q_ml_forecast", oracle=None)
def q_ml_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the pipeline and score every (camera, dow, hour) slot;
    returns slot-level predicted volume next to the replay baseline
    (avg_hourly_volume) for comparison."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler
    from pyspark.ml.regression import LinearRegression

    train = training_frame(spark, sf_dir).cache()
    pipeline = Pipeline(
        stages=[
            StringIndexer(inputCol="camera_id", outputCol="camera_idx", handleInvalid="keep"),
            OneHotEncoder(
                inputCols=["camera_idx", "dow", "hour_of_day"],
                outputCols=["camera_oh", "dow_oh", "hour_oh"],
                handleInvalid="keep",
            ),
            VectorAssembler(
                inputCols=["camera_oh", "dow_oh", "hour_oh"], outputCol="features"
            ),
            LinearRegression(
                featuresCol="features",
                labelCol="hourly_total",
                predictionCol="predicted_volume",
                regParam=0.01,
                elasticNetParam=0.0,
            ),
        ]
    )
    model = pipeline.fit(train)

    slots = (
        train.groupBy("camera_id", "dow", "hour_of_day")
        .agg(
            F.avg("hourly_total").alias("avg_hourly_volume"),
            F.count(F.lit(1)).alias("days_observed"),
        )
    )
    scored = model.transform(slots)
    return (
        scored.select(
            "camera_id",
            "dow",
            "hour_of_day",
            F.round("avg_hourly_volume", 6).alias("avg_hourly_volume"),
            F.round("predicted_volume", 6).alias("predicted_volume"),
            "days_observed",
        )
        .orderBy("camera_id", "dow", "hour_of_day")
    )
