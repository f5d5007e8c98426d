"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``big_data_traffict_prediction_spark``; this
module only adapts it to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_traffict_prediction_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's reason to exist: avg-of-daily-sums
    traffic prediction for a (dow, hour) slot across all cameras
    (reference app/database.py:109-145; SURVEY.md §3.1).
    """
    from big_data_traffict_prediction_spark.operators.prediction import (
        q_predict_dow_hour,
    )

    return q_predict_dow_hour(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for every SQL-expressible query; streaming/ML/LSH
    queries are deliberately omitted (rows-only check)."""
    return registry.all_oracles()
