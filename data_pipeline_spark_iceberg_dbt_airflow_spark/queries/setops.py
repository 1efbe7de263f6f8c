"""Set operations (SURVEY.md §2.7).

The reference's Python-level analog is the 3-way list append of per-API
records (extract_bitcoin_prices.py:150-172), rebuilt as the single-scan
multiplex in reference.py (ref_union_sources). Here the [ext] completions:
UNION DISTINCT, INTERSECT, EXCEPT and EXCEPT ALL, consolidated into ONE
registry entry (round-3 budget) -- set-op results are single-column key
sets by construction, so the four branches union under an ``op`` marker
while each still executes its genuine operator (``distinct`` over union,
``intersect``, ``subtract``, ``exceptAll``; plan shapes asserted in
tests/test_plans.py).

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
    "setop_family",
    oracle="""
        SELECT 'union_distinct' AS op, custkey AS key FROM (
            SELECT o_custkey AS custkey FROM orders
            UNION
            SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
        UNION ALL
        SELECT 'intersect' AS op, custkey AS key FROM (
            SELECT o_custkey AS custkey FROM orders
            INTERSECT
            SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
        UNION ALL
        SELECT 'except' AS op, custkey AS key FROM (
            SELECT c_custkey AS custkey FROM customer
            EXCEPT
            SELECT o_custkey AS custkey FROM orders)
        UNION ALL
        SELECT 'except_all' AS op, user_id AS key FROM (
            SELECT user_id FROM events WHERE event_type = 'click'
            EXCEPT ALL
            SELECT user_id FROM events WHERE event_type = 'purchase')
        UNION ALL
        SELECT 'intersect_all' AS op, user_id AS key FROM (
            SELECT user_id FROM events WHERE event_type = 'click'
            INTERSECT ALL
            SELECT user_id FROM events WHERE event_type = 'purchase')
    """,
    doc="U1-distinct + U2 + U3 set-operation family, consolidated (was "
    "setop_union_distinct / setop_intersect_buyers / setop_except_non_"
    "buyers / setop_except_all_multiset): op='union_distinct' dedups the "
    "union of two key sets (union + hash-distinct, one shuffle); "
    "op='intersect' = customers that both ordered and hold a high balance "
    "(aggregate + left-semi); op='except' = customer keys with no orders "
    "(the set-op rendering of the anti join); op='except_all' = multiset "
    "difference where each click-occurrence cancels one "
    "purchase-occurrence (exceptAll keeps multiplicities -- no distinct "
    "pass); op='intersect_all' = the multiset meet (min of per-key "
    "multiplicities on the two sides).",
    tags=("setop",),
)
def setop_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders_k = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key")
    )
    cust = read_table(spark, sf_dir, "customer")
    rich_k = cust.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("key")
    )
    cust_k = cust.select(F.col("c_custkey").alias("key"))
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("key")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("key")
    )

    def _tag(df: DataFrame, op: str) -> DataFrame:
        return df.select(F.lit(op).alias("op"), F.col("key").cast("bigint"))

    return (
        _tag(orders_k.union(rich_k).distinct(), "union_distinct")
        .unionByName(_tag(orders_k.intersect(rich_k), "intersect"))
        .unionByName(_tag(cust_k.subtract(orders_k), "except"))
        .unionByName(_tag(clicks.exceptAll(purchases), "except_all"))
        .unionByName(_tag(clicks.intersectAll(purchases), "intersect_all"))
    )
