"""Execution-metrics probe (operators/metrics.py): the repo's scale
claims asserted as MEASURED runtime numbers, not just plan shapes."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_pipeline_spark_iceberg_dbt_airflow_spark.io import read_table
from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.metrics import (
    measure,
)
from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import all_queries


def test_map_side_combine_collapses_the_shuffle(spark):
    """1M input rows, 1000 groups: the records that actually cross the
    wire are the per-task partials (<= groups x map tasks), orders of
    magnitude below the input -- the map-side-combine claim, measured."""
    df = spark.range(1_000_000).select(
        (F.col("id") % 1000).alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    agg = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    rows, m = measure(agg)
    assert len(rows) == 1000
    assert 0 < m.shuffle_records <= 1000 * 64
    assert m.shuffle_records < 1_000_000 / 10
    assert m.spill_bytes == 0


def test_exact_dedup_shuffles_digests_not_text(spark, sf_dir):
    """The dedup family's core claim: shuffle rows are fixed-width
    digests + ids, never text. Row COUNT grows with the line-level
    branch, so the scale-valid assertion is bytes per shuffled record:
    digest-width (small constant), far below the average document."""
    docs = read_table(spark, sf_dir, "documents")
    stats = docs.agg(
        F.sum(F.length("text")).alias("b"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    avg_doc = stats["b"] / stats["n"]
    q = all_queries()["dedup_exact_keep_first"].spark_fn(spark, sf_dir)
    rows, m = measure(q)
    assert len(rows) > 0 and m.shuffle_records > 0
    per_record = m.shuffle_bytes / m.shuffle_records
    assert per_record <= 64, (per_record, m)
    assert per_record < avg_doc / 4, (per_record, avg_doc)


def test_broadcast_join_ships_dim_not_fact(spark, sf_dir):
    """The broadcast-join claim: the dimension rides the broadcast
    (nonzero dataSize) and the fact side's shuffle stays
    aggregate-sized, far below the fact table's bytes."""
    li = read_table(spark, sf_dir, "lineitem")
    fact_bytes = li.agg(
        F.sum(F.length(F.concat_ws("|", *li.columns))).alias("b")
    ).collect()[0]["b"]
    q = all_queries()["join_broadcast_brand_revenue"].spark_fn(spark, sf_dir)
    rows, m = measure(q)
    assert len(rows) > 0
    assert m.broadcast_bytes > 0
    assert m.shuffle_bytes < fact_bytes / 10, (m.shuffle_bytes, fact_bytes)


def test_no_spill_across_headline_queries(spark, sf_dir):
    """At test scale every partition must fit comfortably: any spill
    means a sizing regression."""
    for name in ("ref_fct_daily", "agg_pricing_summary", "sort_global_orders"):
        q = all_queries()[name].spark_fn(spark, sf_dir)
        _, m = measure(q)
        assert m.spill_bytes == 0, (name, m)


def test_text_profile_shuffle_is_only_the_widen(spark, sf_dir):
    """The per-row text profile's only exchange is the guarded
    round-robin widen (a no-op on well-split input): measured, exactly
    ONE shuffle, each document crossing exactly once -- no fan-out, no
    key shuffle, nothing after the per-row work."""
    q = all_queries()["text_profile"].spark_fn(spark, sf_dir)
    rows, m = measure(q)
    assert len(rows) > 0
    assert m.shuffle_count == 1, m
    assert m.shuffle_records == len(rows), m


def test_bruteforce_topk_shuffles_scores_not_vectors(spark, sf_dir):
    """Exact top-k's cost model: the corpus streams against the
    broadcast query batch; what shuffles is the (id, id, double)
    scoring stream -- narrow rows, vectors excluded (a 64-dim double
    vector alone is 512 B; measured record width must sit far below)."""
    q = all_queries()["sim_topk_bruteforce"].spark_fn(spark, sf_dir)
    rows, m = measure(q)
    assert len(rows) > 0
    assert m.broadcast_bytes > 0  # the query batch rides the broadcast
    assert m.shuffle_records > 0
    per_record = m.shuffle_bytes / m.shuffle_records
    assert per_record < 128, (per_record, m)


def test_neardup_shuffles_stay_digest_width(spark, sf_dir):
    """Near-dup's shuffles carry shingle ids / signature longs / doc id
    pairs -- never text. Measured: average shuffled record width stays
    far below the average document."""
    docs = read_table(spark, sf_dir, "documents")
    stats = docs.agg(
        F.sum(F.length("text")).alias("b"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    avg_doc = stats["b"] / stats["n"]
    q = all_queries()["dedup_neardup_verified"].spark_fn(spark, sf_dir)
    rows, m = measure(q)
    assert len(rows) > 0 and m.shuffle_records > 0
    per_record = m.shuffle_bytes / m.shuffle_records
    assert per_record < avg_doc / 4, (per_record, avg_doc, m)
