"""Local replica of the driver's t2 gate: every registered query with
an oracle must match DuckDB exactly at sf0.01."""

from __future__ import annotations

import pytest
from compare_util import assert_frames_match

from big_data_traffict_prediction_spark import registry


def _oracle_cases():
    return sorted(registry.all_oracles())


@pytest.mark.parametrize("name", _oracle_cases())
def test_query_matches_oracle(spark, duck, oracle_sf_dir, name):
    q = registry.get(name)
    spark_pdf = q.fn(spark, oracle_sf_dir).toPandas()
    duck_pdf = duck.execute(q.oracle).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", sorted(registry.all_queries()))
def test_query_runs_and_has_stable_schema(spark, sf_dir, name):
    """Every registered query (oracle-backed or rows-only) must run
    with a non-empty schema. Parametrized per query — one monolithic
    loop was a single 200 s test node no parallel runner could split."""
    df = registry.all_queries()[name](spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    df.limit(5).collect()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "avg_hourly_volume" in df.columns
