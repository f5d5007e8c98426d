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


@pytest.fixture(scope="module")
def bucketed_facts(spark, sf_dir, tmp_path_factory):
    """lineitem + orders bucketed on the shared order-key family."""
    from big_data_traffict_prediction_spark.tables import load_table

    wh = tmp_path_factory.mktemp("warehouse_facts")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    bucketed.write_bucketed(
        li, "li_bucketed_test", key="l_orderkey", n_buckets=8,
        sort_key="l_orderkey", path=str(wh / "li"),
    )
    bucketed.write_bucketed(
        o, "o_bucketed_test", key="o_orderkey", n_buckets=8,
        sort_key="o_orderkey", path=str(wh / "o"),
    )
    yield "li_bucketed_test", "o_bucketed_test"
    spark.sql("DROP TABLE IF EXISTS li_bucketed_test")
    spark.sql("DROP TABLE IF EXISTS o_bucketed_test")


def test_bucketed_fact_fact_join_has_no_exchange(spark, sf_dir, bucketed_facts):
    """The q_fulfillment_lag 100 TB layout, demonstrated: lineitem and
    orders bucketed on their order keys join with ZERO exchanges (no
    shuffle of either fact stream) and produce the same row count as
    the plain shuffled join."""
    from big_data_traffict_prediction_spark.tables import load_table

    li_t, o_t = bucketed_facts
    df = bucketed.bucketed_fact_join(spark, li_t, "l_orderkey", o_t, "o_orderkey")
    assert explain.shuffle_count(df) == 0, (
        "bucket-aligned fact join must not shuffle:\n" + explain.formatted_plan(df)
    )
    plain = load_table(spark, sf_dir, "lineitem").join(
        load_table(spark, sf_dir, "orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    assert df.count() == plain.count()
