"""Differential oracle test: every registered query vs its DuckDB oracle.

This is the in-repo mirror of the driver's t2 gate (BASELINE.md): one
parametrized case per registry entry that declares an oracle. Runs at
sf0.001 for speed; set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to
reproduce the driver's scale exactly.
"""

from __future__ import annotations

import pytest

from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import all_queries

from .oracle import compare, run_oracle

SPECS = all_queries()
ORACLED = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    compare(spec.spark_fn(spark, sf_dir), run_oracle(spec.oracle, sf_dir))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.spark_fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
