"""Count-min sketch operator (operators/sketches.py).

The contract is one-sided error: estimates NEVER undercount, overcount
is bounded by the sketch's epsilon, shard sketches merge exactly, and
heavy hitters lose no true member.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_pipeline_spark_iceberg_dbt_airflow_spark.io import read_table
from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
)

WIDTH = 2048


@pytest.fixture(scope="module")
def token_stream(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", r"\s+")).alias("token"))
        .where(F.col("token") != "")
    )


@pytest.fixture(scope="module")
def truth(token_stream):
    return {
        r["token"]: r["cnt"]
        for r in token_stream.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }


@pytest.fixture(scope="module")
def sketch(token_stream):
    return cms_build(token_stream, "token", WIDTH).cache()


def test_estimates_never_undercount_and_stay_bounded(
    spark, token_stream, sketch, truth
):
    n = sum(truth.values())
    probes = token_stream.select("token").distinct()
    est = {
        r["token"]: r["est"]
        for r in cms_estimate(sketch, probes, "token", WIDTH).collect()
    }
    assert set(est) == set(truth)
    import math

    eps_bound = math.e / WIDTH * n
    for t, c in truth.items():
        assert est[t] >= c, (t, est[t], c)
        assert est[t] <= c + 3 * eps_bound, (t, est[t], c, eps_bound)


def test_unseen_tokens_estimate_small(spark, sketch, truth):
    n = sum(truth.values())
    probes = spark.range(50).select(
        F.concat(F.lit("never-seen-"), "id").alias("token")
    )
    est = cms_estimate(sketch, probes, "token", WIDTH).collect()
    import math

    assert all(r["est"] <= 3 * (math.e / WIDTH) * n for r in est)


def test_shard_sketches_merge_exactly(spark, token_stream):
    """sketch(A) + sketch(B) re-summed == sketch(A union B), cell by
    cell -- the distributed-merge property."""
    a = token_stream.where(F.crc32("token") % 2 == 0)
    b = token_stream.where(F.crc32("token") % 2 == 1)
    merged = (
        cms_build(a, "token", WIDTH)
        .unionByName(cms_build(b, "token", WIDTH))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(token_stream, "token", WIDTH)
    diff = merged.join(whole, ["row", "bucket"], "full").where(
        ~(merged["cnt"].eqNullSafe(whole["cnt"]))
    )
    assert diff.count() == 0


def test_heavy_hitters_lose_no_true_member(spark, token_stream, sketch, truth):
    n = sum(truth.values())
    phi = 0.01
    true_heavy = {t for t, c in truth.items() if c >= phi * n}
    assert true_heavy  # the corpus has frequent tokens at this phi
    cands = token_stream.select("token").distinct()
    got = {
        r["token"]
        for r in cms_heavy_hitters(
            sketch, cands, "token", WIDTH, total=n, phi=phi
        ).collect()
    }
    assert true_heavy <= got


def test_build_is_one_combinable_aggregate(spark, token_stream):
    plan = (
        cms_build(token_stream, "token", WIDTH)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("HashAggregate") >= 2  # partial + final = combinable
    assert "Join" not in plan and "Sort" not in plan


def test_null_tokens_are_not_counted(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,)], "token string"
    )
    sk = cms_build(df, "token", 256)
    probes = spark.createDataFrame([("a",)], "token string")
    est = cms_estimate(sk, probes, "token", 256).collect()[0]["est"]
    assert est == 2  # the two NULLs contributed nothing
