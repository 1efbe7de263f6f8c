"""Join family (SURVEY.md §2.3, all [ext]) over the TPC-H-style tables.

The reference declares no JOINs of its own (its two dbt models are
single-table, /root/reference/README.md:368-400) but exposes the full Spark
SQL join surface through spark-sql and the Thrift server
(/root/reference/Iceberg-dbt-project/docker-compose.yml:126-146,
README.md:294-304). These queries re-express that capability envelope in
idiomatic DataFrame code.

Registry budget note (round 3): 7 consolidated entries (was 10, +right
outer which round 2 lacked). The outer family (left/right/full) and the
semi/anti pair each merge into one multi-branch query with a side marker
-- every branch still executes its own genuine join type (plan-asserted
in tests/test_plans.py), the union only assembles the output.

Scale design (100 TB):
- Fact-fact equi joins shuffle on the join key; Catalyst + AQE pick
  sort-merge vs shuffled-hash and split skewed partitions.
- Dimension joins are explicitly ``F.broadcast`` so the fact side never
  shuffles (plan-asserted: BroadcastHashJoin, tests/test_plans.py).
- Non-equi joins only against SMALL sides (literal band tables, 5-row
  dims) so the BroadcastNestedLoopJoin is broadcast, never a full
  cartesian of two big relations.
- The as-of join avoids any join at all: union-marker + running MAX per
  key, one shuffle on (user_id), no point-in-time cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import det
from ..io import read_table
from .registry import register


@register(
    "join_inner_customer_orders",
    oracle="""
        SELECT o.o_orderkey, c.c_name, n.n_name AS nation_name, o.o_totalprice
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    doc="J1 equi inner join, 3-way: fact (orders) -> dim (customer) -> dim "
    "(nation). Catalyst broadcast-joins the small sides automatically under "
    "AQE; at scale customer may exceed the broadcast threshold and fall back "
    "to sort-merge -- both correct, the optimizer decides.",
    bench=True,
    tags=("join",),
)
def join_inner_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .select(
            "o_orderkey",
            "c_name",
            F.col("n_name").alias("nation_name"),
            "o_totalprice",
        )
    )


@register(
    "join_outer_family",
    oracle=f"""
        SELECT 'left' AS side, CAST(c.c_custkey AS BIGINT) AS key, c.c_name AS name,
               COUNT(o.o_orderkey) AS cnt,
               {det.oracle_dsum("o.o_totalprice", 2)} AS val
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
        UNION ALL
        SELECT 'right' AS side, CAST(c.c_custkey AS BIGINT) AS key, c.c_name AS name,
               COUNT(o.o_orderkey) AS cnt,
               {det.oracle_dsum("o.o_totalprice", 2)} AS val
        FROM orders o
        RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
        UNION ALL
        SELECT 'full' AS side,
               CAST(COALESCE(cs.c_nationkey, ss.s_nationkey) AS BIGINT) AS key,
               CAST(NULL AS VARCHAR) AS name,
               cs.customer_cnt AS cnt,
               CAST(ss.supplier_cnt AS DOUBLE) AS val
        FROM (SELECT c_nationkey, COUNT(*) AS customer_cnt
              FROM customer GROUP BY c_nationkey) cs
        FULL OUTER JOIN
             (SELECT s_nationkey, COUNT(*) AS supplier_cnt
              FROM supplier GROUP BY s_nationkey) ss
        ON cs.c_nationkey = ss.s_nationkey
    """,
    doc="J1 outer-join family, consolidated (was join_left_order_counts + "
    "join_full_nation_presence; right outer was the one §2.3 gap in round "
    "2): side='left' keeps every customer through a LEFT join to orders "
    "(zero-order customers get COUNT 0 / NULL sum); side='right' computes "
    "the identical result through a genuine RIGHT OUTER join with orders "
    "as the left input -- same hash join, build/stream sides swapped "
    "(plan-asserted RightOuter in tests); side='full' FULL-OUTER-joins "
    "two per-nation aggregates so nations with customers but no suppliers "
    "(and vice versa) survive with NULLs. Aggregation-after-join is one "
    "key shuffle per branch; partial counts push map-side.",
    tags=("join", "outer"),
)
def join_outer_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")

    def _counts(joined: DataFrame, side: str) -> DataFrame:
        return joined.groupBy("c_custkey", "c_name").agg(
            F.count("o_orderkey").alias("cnt"),
            det.dsum("o_totalprice", 2).alias("val"),
        ).select(
            F.lit(side).alias("side"),
            F.col("c_custkey").cast("bigint").alias("key"),
            F.col("c_name").alias("name"),
            "cnt",
            "val",
        )

    left = _counts(
        customer.join(orders, orders.o_custkey == customer.c_custkey, "left"),
        "left",
    )
    right = _counts(
        orders.join(customer, orders.o_custkey == customer.c_custkey, "right"),
        "right",
    )
    cs = (
        customer.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("customer_cnt"))
    )
    ss = (
        read_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
    )
    full = cs.join(ss, cs.c_nationkey == ss.s_nationkey, "full").select(
        F.lit("full").alias("side"),
        F.coalesce("c_nationkey", "s_nationkey").cast("bigint").alias("key"),
        F.lit(None).cast("string").alias("name"),
        F.col("customer_cnt").alias("cnt"),
        F.col("supplier_cnt").cast("double").alias("val"),
    )
    return left.unionByName(right).unionByName(full)


@register(
    "join_broadcast_brand_revenue",
    oracle=f"""
        SELECT p.p_brand,
               {det.oracle_dsum("l.l_extendedprice * (1 - l.l_discount)", 4)}
                   AS revenue,
               COUNT(*) AS line_cnt
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    """,
    doc="J2 broadcast dimension join: the fact (lineitem) never shuffles for "
    "the join -- part is broadcast to every task (BroadcastHashJoin, "
    "plan-asserted). The canonical 100 TB star-join shape: one shuffle total "
    "(the groupBy), not two.",
    bench=True,
    tags=("join", "broadcast"),
)
def join_broadcast_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            det.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


@register(
    "join_semi_anti",
    oracle="""
        SELECT 'semi' AS kind, c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        UNION ALL
        SELECT 'anti' AS kind, c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="J3 LEFT SEMI + LEFT ANTI joins, consolidated (was "
    "join_semi_customers_with_orders + join_anti_customers_without_orders): "
    "kind='semi' = customers having at least one order (probe side emits "
    "each row at most once, no order columns flow through -- cheaper than "
    "inner-join+distinct at any scale); kind='anti' = customers with none "
    "(the dbt-style 'relationships' data test as a query). Both branches "
    "run their genuine join type (plan-asserted LeftSemi/LeftAnti); "
    "together they partition customer.",
    tags=("join", "semi", "anti"),
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_mktsegment"]
    semi = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select(F.lit("semi").alias("kind"), *cols)
    anti = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select(F.lit("anti").alias("kind"), *cols)
    return semi.unionByName(anti)


@register(
    "join_theta_late_shipments",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber,
               CAST(l.l_shipdate AS TIMESTAMP) AS l_shipdate, o.o_orderdate
        FROM lineitem l
        JOIN orders o
          ON l.l_orderkey = o.o_orderkey
         AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    """,
    doc="J4 theta join: equi key + non-equi time condition (shipped >90 days "
    "after order). Catalyst keeps the equi part as the shuffle key and "
    "applies the range predicate as a post-join filter, so this stays a "
    "hash/sort-merge join -- no nested loop.",
    bench=True,
    tags=("join", "theta"),
)
def join_theta_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    return lineitem.join(
        orders,
        (lineitem.l_orderkey == orders.o_orderkey)
        & (lineitem.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate")


@register(
    "join_range_cross",
    oracle="""
        SELECT 'range' AS kind, b.band AS k1, CAST(NULL AS VARCHAR) AS k2,
               COUNT(*) AS cnt
        FROM part p
        JOIN (VALUES ('low', 900.0, 935.0),
                     ('mid', 935.0, 970.0),
                     ('high', 970.0, 1000.0)) AS b(band, lo, hi)
          ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
        GROUP BY b.band
        UNION ALL
        SELECT 'cross' AS kind, r.r_name AS k1, s.c_mktsegment AS k2,
               CAST(NULL AS BIGINT) AS cnt
        FROM region r
        CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) s
    """,
    doc="J5 range/interval join + J7 explicit cross join, consolidated (was "
    "join_range_price_bands + join_cross_region_segments): kind='range' "
    "buckets a big table by value ranges from a 3-row band table -- the "
    "band side is a broadcast LocalRelation, so Spark plans "
    "BroadcastNestedLoopJoin, the only safe physical shape for non-equi "
    "conditions (NEVER with two large sides; use bucketing or explicit "
    "range-partitioning there); kind='cross' is a deliberate cartesian of "
    "two tiny relations (5x5) through the crossJoin() API surface -- "
    "Spark refuses implicit cartesians; at scale only ever with a "
    "broadcast-size side.",
    tags=("join", "range", "cross"),
)
def join_range_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("low", 900.0, 935.0), ("mid", 935.0, 970.0), ("high", 970.0, 1000.0)],
        "band string, lo double, hi double",
    )
    range_part = (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.lit("range").alias("kind"),
            F.col("band").alias("k1"),
            F.lit(None).cast("string").alias("k2"),
            "cnt",
        )
    )
    region = read_table(spark, sf_dir, "region")
    segments = read_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()
    cross_part = region.crossJoin(segments).select(
        F.lit("cross").alias("kind"),
        F.col("r_name").alias("k1"),
        F.col("c_mktsegment").alias("k2"),
        F.lit(None).cast("bigint").alias("cnt"),
    )
    return range_part.unionByName(cross_part)


@register(
    "join_asof_last_click",
    oracle="""
        SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
               (SELECT MAX(CAST(c.ts AS TIMESTAMP)) FROM events c
                WHERE c.user_id = p.user_id AND c.event_type = 'click'
                  AND c.ts <= p.ts) AS last_click_ts
        FROM events p
        WHERE p.event_type = 'purchase'
    """,
    doc="J6 as-of join (nearest prior match), the one join Spark 3/4 lacks "
    "natively (SURVEY.md §2.3): for each purchase, the latest click of the "
    "same user at-or-before it. Implemented WITHOUT a join: union-marker + "
    "running MAX over a (user_id, ts) window -- one shuffle, no per-row "
    "point-in-time probe, linear in events at any scale.",
    tags=("join", "asof", "window"),
)
def join_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    marked = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    # clicks sort before purchases at identical ts (<= semantics); running
    # MAX is order-insensitive within the frame so tie order among clicks
    # doesn't matter.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc_nulls_last("ts"), F.asc_nulls_last("event_type"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # A purchase with NULL event time has no as-of point: emit NULL
    # (matches the oracle's correlated `c.ts <= p.ts`, which no click can
    # satisfy). Without the guard, nulls-last ordering would hand the
    # NULL-ts row a frame spanning every click.
    return (
        marked.withColumn(
            "last_click_ts",
            F.when(
                F.col("ts").isNotNull(), F.max("click_ts").over(w)
            ),
        )
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_click_ts")
    )
