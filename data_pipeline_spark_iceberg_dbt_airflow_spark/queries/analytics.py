"""Multi-join analytical queries in classic TPC-H shapes (Q3/Q5/Q10).

The reference exposes the full Spark SQL surface operationally through
spark-sql and the Thrift server (/root/reference/Iceberg-dbt-project/
docker-compose.yml:126-146, README.md:294-304); single-join queries live in
queries/joins.py. These are the composite shapes a warehouse user actually
runs -- selective scan -> multi-way join -> aggregate -> top-k -- and the
heavyweight end of the bench set.

Scale design (100 TB):
- Every filter is applied BEFORE its join so the scan, not the join,
  drops the rows (predicate pushdown reaches the parquet reader; the
  selective sides shrink the shuffle).
- Dimension tables (nation, region, supplier at dim-scale) are explicit
  ``F.broadcast``: the fact side shuffles only for fact-fact joins and the
  final aggregation.
- Top-k output is orderBy().limit() = TakeOrderedAndProject -- no global
  sort. Ties are broken by key columns so the selected prefix is
  deterministic across engines (required for the differential oracle).
- Revenue sums go through functions/det.py (exact DECIMAL accumulation)
  so partition order / AQE re-planning can't flip low bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import det
from ..io import read_table
from .registry import register


@register(
    "analytics_unshipped_revenue",
    oracle=f"""
        SELECT l.l_orderkey,
               {det.oracle_dsum("l.l_extendedprice * (1 - l.l_discount)", 4)}
                   AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND l.l_shipdate >= TIMESTAMP '1998-01-01'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3 shape: revenue of ordered-but-unshipped lineitems for one "
    "market segment, top 10. Both fact filters (orderdate, shipdate) reach "
    "their scans; the customer filter shrinks the dim before the join. "
    "orderBy(revenue desc, l_orderkey).limit(10) plans as "
    "TakeOrderedAndProject -- per-partition heaps, no global sort.",
    bench=True,
    tags=("analytics", "join", "topk"),
)
def analytics_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-01-01").cast("timestamp")
    customer = (
        read_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    lineitem = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") >= cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            det.dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "analytics_local_supplier_volume",
    oracle=f"""
        SELECT n.n_name AS nation_name,
               {det.oracle_dsum("l.l_extendedprice * (1 - l.l_discount)", 4)}
                   AS revenue
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
                       AND s.s_nationkey = c.c_nationkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: revenue by nation where the customer and the "
    "lineitem's supplier share a nation, restricted to one region and one "
    "order-year. 6-way join; supplier/nation/region are broadcast (the "
    "region filter prunes nation -> supplier transitively on the broadcast "
    "side), so the only big shuffles are orders><lineitem and the final "
    "tiny groupBy. The s_nationkey = c_nationkey condition rides the "
    "supplier join -- no extra shuffle.",
    bench=True,
    tags=("analytics", "join", "broadcast"),
)
def analytics_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        read_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supplier = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    dim = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supplier),
            (supplier.s_suppkey == lineitem.l_suppkey)
            & (supplier.s_nationkey == F.col("c_nationkey")),
        )
        .join(F.broadcast(dim), F.col("s_nationkey") == dim.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            det.dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue")
        )
    )


@register(
    "analytics_returned_item_customers",
    oracle=f"""
        SELECT c.c_custkey, c.c_name,
               {det.oracle_dsum("l.l_extendedprice * (1 - l.l_discount)", 4)}
                   AS revenue,
               n.n_name AS nation_name
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-04-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10 shape: customers who returned the most revenue in one "
    "quarter, top 20. The returnflag filter drops ~2/3 of lineitem at the "
    "scan; nation is broadcast; the order-quarter filter makes the "
    "orders><lineitem shuffle small. Deterministic top-k via the "
    "(revenue, c_custkey) tiebreak.",
    bench=True,
    tags=("analytics", "join", "topk"),
)
def analytics_returned_item_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = (
        read_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    lineitem = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation")
    return (
        orders.join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(
            det.dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "nation_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )
