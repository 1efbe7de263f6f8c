"""Property tests for the pure-Python deterministic building blocks.

These run WITHOUT a SparkSession (hypothesis example counts are cheap
here), pinning the invariants the distributed operators lean on: hash
coefficients in range, band classification totality, and the ns-bound
arithmetic that feeds pushed-down scan predicates.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_spark_iceberg_dbt_airflow_spark.io import _iso_to_ns
from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.udfs import (
    LONG,
    SHORT,
    band_of,
)
from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.dedup import (
    MH_P,
    NUM_PERM,
    _mh_coeffs,
)


@given(st.integers(min_value=0, max_value=10_000))
def test_mh_coeffs_are_valid_carter_wegman(s):
    a, b = _mh_coeffs(s)
    assert 1 <= a < MH_P and 0 <= b < MH_P


def test_mh_coeffs_distinct_across_permutations():
    seen = {_mh_coeffs(s) for s in range(NUM_PERM)}
    assert len(seen) == NUM_PERM


@given(st.integers(min_value=0, max_value=28) , st.integers(min_value=0, max_value=2**28 - 1))
def test_mh_permutation_stays_in_bigint(s, h):
    a, b = _mh_coeffs(s)
    v = a * h + b  # the widest intermediate the Spark expression computes
    assert v < 2**63, "BIGINT overflow in the permutation arithmetic"
    assert 0 <= v % MH_P < MH_P


@given(st.one_of(st.none(), st.integers(min_value=-10, max_value=10_000)))
def test_band_of_total_and_ordered(n):
    band = band_of(n)
    if n is None:
        assert band is None
    elif n < SHORT:
        assert band == "short"
    elif n < LONG:
        assert band == "medium"
    else:
        assert band == "long"


@settings(max_examples=200)
@given(
    st.datetimes(
        min_value=dt.datetime(1970, 1, 1),
        max_value=dt.datetime(2100, 1, 1),
    )
)
def test_iso_to_ns_round_trips_microseconds(d):
    ns = _iso_to_ns(d.isoformat())
    assert ns % 1000 == 0
    back = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=ns // 1000)
    assert back == d
