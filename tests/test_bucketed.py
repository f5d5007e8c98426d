"""Bucketed storage: the write-once-shuffle, read-many-shuffle-free
contract, asserted on physical plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_traffict_prediction_spark.plans import explain
from big_data_traffict_prediction_spark.sources import bucketed
from big_data_traffict_prediction_spark.tables import traffic_history


@pytest.fixture(scope="module")
def bucketed_table(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    table = "traffic_bucketed_test"
    h = traffic_history(spark, sf_dir).select("camera_id", "ts", "id", "new_count")
    bucketed.write_bucketed(h, table, n_buckets=8, path=str(wh / table))
    yield table
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_table):
    df = bucketed.per_key_totals(spark, bucketed_table)
    assert explain.shuffle_count(df) == 0, (
        "groupBy on the bucket key must not shuffle:\n" + explain.formatted_plan(df)
    )
    # and it still computes the right thing
    direct = (
        spark.table(bucketed_table)
        .groupBy("camera_id")
        .agg(F.sum("new_count").alias("t"))
        .collect()
    )
    got = {r["camera_id"]: r["total_new_count"] for r in df.collect()}
    assert got == {r["camera_id"]: r["t"] for r in direct}


def test_bucketed_join_has_no_exchange(spark, bucketed_table):
    df = bucketed.bucketed_self_join_latest(spark, bucketed_table)
    assert explain.shuffle_count(df) == 0, (
        "equi-join on the bucket key must be co-located:\n"
        + explain.formatted_plan(df)
    )
    n_cameras = spark.table(bucketed_table).select("camera_id").distinct().count()
    assert df.count() == n_cameras
