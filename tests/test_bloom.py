"""Bloom-filter blocklist gate (operators/bloom.py).

The operator's contract is "exact anti-join answer at bloom-gate cost":
no false negatives ever (screening equivalence), measured false-positive
rate near theory, a probe that stays a zero-shuffle codegen expression,
and bit-reproducible filters.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_pipeline_spark_iceberg_dbt_airflow_spark.io import read_table
from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.bloom import (
    blocklist_screen,
    bloom_build,
    bloom_fp_rate,
    with_bloom_flag,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


def test_no_false_negatives(spark):
    """Every built key must probe true -- the property that makes the
    gate a pure work-pruner."""
    keys = spark.range(0, 3000).select(F.concat(F.lit("url-"), "id").alias("k"))
    words = bloom_build(keys, "k", num_bits=3000 * 10 // 64 * 64)
    flagged = with_bloom_flag(keys, words, F.col("k"), "maybe")
    assert flagged.where(~F.col("maybe")).count() == 0


def test_fp_rate_near_theory(spark):
    n, bits = 3000, 3000 * 10 // 64 * 64
    keys = spark.range(0, n).select(F.concat(F.lit("url-"), "id").alias("k"))
    words = bloom_build(keys, "k", num_bits=bits)
    probes = spark.range(n, n + 20000).select(
        F.concat(F.lit("url-"), "id").alias("k")
    )
    fp = (
        with_bloom_flag(probes, words, F.col("k"), "maybe")
        .where("maybe")
        .count()
        / 20000
    )
    theory = bloom_fp_rate(bits, n, 4)
    assert fp <= 3 * theory + 0.002, (fp, theory)


def test_screen_equals_exact_anti_join(spark, docs):
    """The full gate (bloom prefilter + exact remainder join) returns
    exactly the anti-join's rows -- false positives are restored, true
    members removed."""
    block = docs.where(F.col("doc_id") % 7 == 3).select(
        F.md5("text").alias("k")
    )
    corpus = docs.select("doc_id", F.md5("text").alias("k"))
    got = sorted(
        r["doc_id"] for r in blocklist_screen(corpus, block, "k").collect()
    )
    want = sorted(
        r["doc_id"]
        for r in corpus.join(block.distinct(), "k", "left_anti").collect()
    )
    assert got == want and len(want) > 0


def test_null_keys_pass_through(spark):
    corpus = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, k string"
    )
    block = spark.createDataFrame([("a",)], "k string")
    kept = {r["id"] for r in blocklist_screen(corpus, block, "k").collect()}
    assert kept == {2, 3}


def test_probe_never_shuffles_the_corpus(spark, docs):
    """The gate's cost model: the corpus side must see NO shuffle and no
    key-matching join -- only the one-row filter broadcast."""
    keys = spark.range(0, 100).select(F.col("id").cast("string").alias("k"))
    words = bloom_build(keys, "k", num_bits=1024)
    gated = with_bloom_flag(docs, words, F.md5("text"), "maybe").where(
        ~F.col("maybe")
    )
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan  # no shuffle exchange
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the one-row filter ride-along


def test_build_is_reproducible(spark):
    keys = spark.range(0, 500).select(F.col("id").cast("string").alias("k"))
    w1 = bloom_build(keys, "k", num_bits=4096)
    w2 = bloom_build(keys.repartition(7), "k", num_bits=4096)
    assert w1 == w2
