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


# --- round-4 row-side kernels ----------------------------------------------


@given(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=2, max_size=60
    )
)
def test_sorted_run_equals_max_frequency(tokens):
    """The identity the text_profile rep_2gram fold relies on: after
    sorting, the longest run of equal adjacent elements IS the max
    multiset frequency (queries/text.py computes the left side in one
    Spark fold; the DuckDB oracle computes the right side naively)."""
    from collections import Counter

    grams = [f"{a} {b}" for a, b in zip(tokens, tokens[1:])]
    best = run = 0
    prev = None
    for g in sorted(grams):
        run = run + 1 if g == prev else 1
        best = max(best, run)
        prev = g
    assert best == max(Counter(grams).values())


@given(
    st.lists(
        st.floats(
            allow_nan=False,
            allow_infinity=False,
            width=32,
        ),
        min_size=1,
        max_size=64,
    )
)
def test_symmetric_int8_codes_stay_in_range(vec):
    """The q8 quantizer's invariant (queries/similarity.py
    quantized_rerank_topk): q_i = floor(e_i * 127/max_abs + 0.5) lands in
    [-127, 127] for every FLOAT32 input -- the embedding column's type
    (float32's smallest denormal ~1e-45 keeps 127/max_abs finite; a raw
    double below ~1e-305 would overflow the scale, which is outside the
    operator's input domain) -- including the all-zero vector (scale 0
    by the guard) and the extremes (|e| == max_abs rounds to exactly
    +/-127)."""
    import math

    mx = max(abs(v) for v in vec)
    scl = 127.0 / mx if mx > 0 else 0.0
    codes = [math.floor(v * scl + 0.5) for v in vec]
    assert all(-127 <= q <= 127 for q in codes), (vec, codes)
    if mx == 0:
        assert set(codes) == {0}
