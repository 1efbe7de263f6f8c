"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(``data_pipeline_spark_iceberg_dbt_airflow_spark.queries``): every
implemented operator from SURVEY.md §2 registers a PySpark implementation
paired with a DuckDB-runnable ANSI-SQL oracle; this module just re-exposes
that registry in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's whole transform chain collapsed onto the
    events table: scan -> staging projection -> daily grouped MIN/MAX/AVG/
    COUNT (fct_bitcoin_daily, /root/reference README.md:386-400).
    """
    return all_queries()["ref_fct_daily"].spark_fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark_fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL per query, runnable by DuckDB on the same parquet.

    Queries whose semantics are not SQL-expressible (approx sketches, LSH,
    streaming state) register ``oracle=None`` and are omitted here; the
    driver records a rows-only check for those.
    """
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
