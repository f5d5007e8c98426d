"""Property tests (SURVEY.md §5 layer 5): the invariants the
reference's sync_stats_db.py exists to repair, plus order-insensitivity
of every aggregation family.

Hypothesis drives small row sets (Spark job per example → keep example
counts low, deadline off); properties are exact because all aggregated
values are integers.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)

row_strategy = st.tuples(
    st.integers(min_value=0, max_value=4),       # camera
    st.integers(min_value=0, max_value=86_400 * 6),  # ts offset (s)
    st.integers(min_value=0, max_value=100),     # new_count
)

rows_strategy = st.lists(row_strategy, min_size=1, max_size=40)

prop_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (str(cam), BASE + dt.timedelta(seconds=off), cnt)
            for cam, off, cnt in rows
        ],
        "camera_id string, ts timestamp, new_count long",
    )


@given(rows=rows_strategy)
@prop_settings
def test_per_camera_totals_sum_to_global(spark, rows):
    df = _df(spark, rows)
    per_cam = df.groupBy("camera_id").agg(F.sum("new_count").alias("t"))
    global_total = df.agg(F.sum("new_count").alias("t")).first().t
    assert sum(r.t for r in per_cam.collect()) == global_total


@given(rows=rows_strategy)
@prop_settings
def test_bucket_sums_partition_the_total(spark, rows):
    df = _df(spark, rows)
    buckets = (
        df.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.sum("new_count").alias("t"))
    )
    total = df.agg(F.sum("new_count").alias("t")).first().t
    assert sum(r.t for r in buckets.collect()) == total


@given(rows=rows_strategy, seed=st.integers(min_value=0, max_value=2**31 - 1))
@prop_settings
def test_aggregation_is_row_order_insensitive(spark, rows, seed):
    import random

    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)
    a = _df(spark, rows).groupBy("camera_id").agg(F.sum("new_count").alias("t"))
    b = _df(spark, shuffled).groupBy("camera_id").agg(F.sum("new_count").alias("t"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


@given(rows=rows_strategy)
@prop_settings
def test_trailing_window_equals_filter_then_sum(spark, rows):
    # conditional aggregation (the single-pass A8 trick) must equal
    # the naive filter-then-aggregate
    df = _df(spark, rows)
    cutoff = BASE + dt.timedelta(days=3)
    cond = (
        df.agg(
            F.coalesce(
                F.sum(F.when(F.col("ts") >= F.lit(cutoff), F.col("new_count"))),
                F.lit(0),
            ).alias("t")
        ).first().t
    )
    naive = (
        df.filter(F.col("ts") >= F.lit(cutoff))
        .agg(F.coalesce(F.sum("new_count"), F.lit(0)).alias("t"))
        .first().t
    )
    assert cond == naive
