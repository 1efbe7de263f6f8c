"""Smoke test of the driver contract (t1)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"extraction_date", "data_source", "records"} <= set(df.columns)


def test_contract_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


def test_registry_within_driver_window():
    """The driver verifies only the first DRIVER_WINDOW registry entries
    (round 2 checked exactly 50 of 87, leaving 37 queries unverified).
    Every entry must fall inside the window or it silently escapes the
    correctness gate."""
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import DRIVER_WINDOW

    qs = entrymod.queries()
    assert len(qs) <= DRIVER_WINDOW, (
        f"{len(qs)} registered queries exceed the driver's "
        f"{DRIVER_WINDOW}-entry verification window; consolidate "
        f"(see queries/__init__.py)"
    )
