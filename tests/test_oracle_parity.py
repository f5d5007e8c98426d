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


def test_all_queries_run_and_have_stable_schema(spark, sf_dir):
    """Queries without an oracle still must run (rows-only check)."""
    for name, fn in registry.all_queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name}: empty schema"
        df.limit(5).collect()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "avg_hourly_volume" in df.columns
