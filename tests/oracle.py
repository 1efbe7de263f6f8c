"""Local differential-oracle harness.

Approximates the driver's t2 check: run the registered PySpark query and its
ANSI-SQL oracle (DuckDB) over the same parquet tables, then compare
row-count, schema shape, and an order-insensitive canonical form. Columns are
sorted by name before comparison (the driver hashes that way), so Spark/SQL
column-name mismatches fail loudly here first.
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Any

import duckdb
import numpy as np
import pandas as pd

from data_pipeline_spark_iceberg_dbt_airflow_spark.io import TABLES, table_path

FLOAT_DECIMALS = 6


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    import os

    con = duckdb.connect()
    try:
        # Views only for tables present on disk (the embeddings-less
        # sweep removes one): an oracle referencing an absent table then
        # fails loudly at query time instead of at harness setup.
        for t in TABLES:
            p = table_path(sf_dir, t)
            if os.path.exists(p):
                con.sql(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        return con.sql(sql).df()
    finally:
        con.close()


def _canon_value(v: Any) -> Any:
    # Numeric canon carries a KIND TAG ("f"/"i") so int-vs-float dtype drift
    # (DuckDB HUGEINT->float64, DuckDB CEIL->DOUBLE vs Spark BIGINT) fails
    # HERE the way it fails the driver's type-sensitive value hash -- Python
    # == would silently accept 950 == 950.0. Integer WIDTHS stay equal
    # (int32 year() == int64 year()): the driver hashes those identically.
    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return ("f", "NaN")
        r = round(v, FLOAT_DECIMALS)
        return ("f", 0.0 if r == 0 else r)  # -0.0 == 0.0
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        # pd.NaT is a datetime instance; it must canonicalize as NULL
        # (Spark surfaces NULL timestamps as None, DuckDB as NaT).
        if pd.isna(v):
            return None
        return pd.Timestamp(v).isoformat()
    if isinstance(v, dt.date):
        # Spark DATE -> datetime.date; DuckDB DATE -> midnight datetime64.
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v


def canonicalize(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf[sorted(pdf.columns)]
    rows = []
    for row in pdf.itertuples(index=False, name=None):
        rows.append(
            tuple(
                _canon_value(v.tolist() if isinstance(v, np.ndarray) else v)
                for v in row
            )
        )
    rows.sort(key=repr)
    return rows


def compare(spark_df, oracle_pdf: pd.DataFrame) -> None:
    """Raise AssertionError with a readable diff on any mismatch."""
    spark_pdf = spark_df.toPandas()
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"column mismatch: spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(
            f"value mismatch ({sum(1 for x, y in zip(a, b) if x != y)} rows); "
            f"first diffs (spark, oracle): {diffs}"
        )
