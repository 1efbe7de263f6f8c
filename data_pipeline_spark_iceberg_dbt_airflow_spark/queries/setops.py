"""Set operations (SURVEY.md §2.7).

The reference's Python-level analog is the 3-way list append of per-API
records (extract_bitcoin_prices.py:150-172), rebuilt as the single-scan
multiplex in reference.py (ref_union_sources). Here the [ext] completions:
UNION DISTINCT, INTERSECT, EXCEPT / EXCEPT ALL.

Scale notes: every distinct-flavored set op is a shuffle on the full row
(hash-distinct); INTERSECT/EXCEPT plan as left-semi/left-anti aggregates.
Prefer the ALL variants + explicit aggregation when multiset semantics
suffice -- they skip the distinct pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register


@register(
    "setop_union_distinct",
    oracle="""
        SELECT o_custkey AS custkey FROM orders
        UNION
        SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    """,
    doc="U1-distinct: UNION (dedup) of two key sets -- union + hash-distinct "
    "in one shuffle.",
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = read_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    b = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return a.union(b).distinct()


@register(
    "setop_intersect_buyers",
    oracle="""
        SELECT o_custkey AS custkey FROM orders
        INTERSECT
        SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    """,
    doc="U2 INTERSECT (distinct): customers that both ordered and hold a "
    "high balance; plans as an aggregate + left-semi join.",
    tags=("setop",),
)
def setop_intersect_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = read_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    b = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return a.intersect(b)


@register(
    "setop_except_non_buyers",
    oracle="""
        SELECT c_custkey AS custkey FROM customer
        EXCEPT
        SELECT o_custkey AS custkey FROM orders
    """,
    doc="U3 EXCEPT (distinct): customer keys with no orders -- the set-op "
    "rendering of the anti join.",
    tags=("setop",),
)
def setop_except_non_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    b = read_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return a.subtract(b)


@register(
    "setop_except_all_multiset",
    oracle="""
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT ALL
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    doc="U3 EXCEPT ALL: multiset difference (each click-occurrence of a "
    "user cancels against one purchase-occurrence). exceptAll keeps "
    "multiplicities -- no distinct pass.",
    tags=("setop",),
)
def setop_except_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.exceptAll(b)
