"""Aggregation extensions (SURVEY.md §2.4 A2-A4, [ext]).

The reference's only aggregate is the flagship grouped MIN/MAX/AVG/COUNT
(fct_bitcoin_daily, /root/reference/README.md:390-399); its exposed SQL
surface covers the full Spark aggregate family. Implemented here:
count-distinct (exact + HLL approx), rollup/cube/grouping-sets, stddev /
percentile / conditional / collect aggregates, and a TPC-H-Q1-shaped
pricing summary as the heavyweight bench aggregate.

Float discipline: every SUM/AVG/STDDEV over DOUBLE goes through
functions/det.py (exact DECIMAL accumulation) so results are
order-independent -- mandatory under AQE where partition order is not
stable run-to-run.

Scale notes: all of these are single-shuffle partial+final HashAggregates.
COUNT(DISTINCT x) expands to a two-phase aggregate (distinct-expand then
count) -- fine for one distinct column; prefer approx_count_distinct when
multiple distinct measures would multiply the expansion. rollup/cube use
Catalyst's Expand node: output rows = input x grouping-set count, priced
accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import det
from ..io import read_table
from .registry import register


@register(
    "agg_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {det.oracle_dsum("l_quantity", 2)} AS sum_qty,
               {det.oracle_dsum("l_extendedprice", 2)} AS sum_base_price,
               {det.oracle_dsum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
               {det.oracle_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
               {det.oracle_davg("l_quantity", 2)} AS avg_qty,
               {det.oracle_davg("l_extendedprice", 2)} AS avg_price,
               {det.oracle_davg("l_discount", 2)} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="A4 heavyweight grouped aggregate, the TPC-H Q1 shape: full lineitem "
    "scan, pushed time predicate, 8 measures over 2 low-cardinality keys. "
    "One shuffle, map-side partials carry ~6 groups per task regardless of "
    "input size -- the benchmark-defining aggregate at any scale.",
    bench=True,
    tags=("aggregate",),
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            det.dsum("l_quantity", 2).alias("sum_qty"),
            det.dsum("l_extendedprice", 2).alias("sum_base_price"),
            det.dsum(disc_price, 4).alias("sum_disc_price"),
            det.dsum(charge, 6).alias("sum_charge"),
            det.davg("l_quantity", 2).alias("avg_qty"),
            det.davg("l_extendedprice", 2).alias("avg_price"),
            det.davg("l_discount", 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_count_distinct_users",
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT user_id) AS distinct_users,
               COUNT(*) AS events
        FROM events
        GROUP BY event_type
    """,
    doc="A2 exact count-distinct per group. Catalyst plans the two-phase "
    "distinct-expand aggregate; exact answers shuffle every (key, user) "
    "pair once.",
    tags=("aggregate", "distinct"),
)
def agg_count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.count(F.lit(1)).alias("events"),
    )


@register(
    "agg_approx_count_distinct",
    oracle=None,  # HLL++ sketch: engine-specific estimates, rows-only check
    doc="A2 approximate count-distinct (HyperLogLog++, rsd=0.01). The 100 TB "
    "path when exact distinct counts would shuffle too much or several "
    "distinct measures share one pass; estimates are engine-specific so no "
    "cross-engine oracle exists (rows-only check).",
    tags=("aggregate", "distinct", "approx"),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users")
    )


@register(
    "agg_rollup_shipments",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {det.oracle_dsum("l_quantity", 2)} AS sum_qty,
               COUNT(*) AS line_cnt
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="A3 ROLLUP: hierarchical subtotals (flag, flag+status, grand total) "
    "in one pass via Catalyst's Expand -- input replicated once per "
    "grouping set, then a normal hash aggregate.",
    tags=("aggregate", "rollup"),
)
def agg_rollup_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        det.dsum("l_quantity", 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("line_cnt"),
    )


@register(
    "agg_cube_orders",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS order_cnt,
               {det.oracle_dsum("o_totalprice", 2)} AS total_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="A3 CUBE: all 4 grouping sets of (status, priority) in one Expand "
    "pass.",
    tags=("aggregate", "cube"),
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_cnt"),
        det.dsum("o_totalprice", 2).alias("total_price"),
    )


@register(
    "agg_grouping_sets_explicit",
    oracle=f"""
        SELECT c_mktsegment, c_nationkey,
               GROUPING(c_mktsegment) AS g_seg,
               GROUPING(c_nationkey) AS g_nat,
               COUNT(*) AS customer_cnt,
               {det.oracle_dsum("c_acctbal", 2)} AS total_acctbal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """,
    doc="A3 explicit GROUPING SETS with GROUPING() markers disambiguating "
    "the set-level NULLs from data NULLs.",
    tags=("aggregate", "grouping_sets"),
)
def agg_grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_gs_view"
    )
    return spark.sql(
        f"""
        SELECT c_mktsegment, c_nationkey,
               GROUPING(c_mktsegment) AS g_seg,
               GROUPING(c_nationkey) AS g_nat,
               COUNT(*) AS customer_cnt,
               {det.oracle_dsum("c_acctbal", 2)} AS total_acctbal
        FROM customer_gs_view
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


@register(
    "agg_stats_dispersion",
    oracle=f"""
        SELECT l_returnflag,
               {det.oracle_dstddev_samp("l_quantity")} AS qty_stddev,
               {det.oracle_dvar_samp("l_quantity")} AS qty_var,
               {det.oracle_davg("l_quantity", 2)} AS qty_avg
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="A4 dispersion statistics: sample stddev/variance from exact sums of "
    "x and x^2 (functions/det.py) -- order-independent, unlike the "
    "streaming-moment implementations both engines use natively.",
    tags=("aggregate", "stats"),
)
def agg_stats_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        det.dstddev_samp("l_quantity").alias("qty_stddev"),
        det.dvar_samp("l_quantity").alias("qty_var"),
        det.davg("l_quantity", 2).alias("qty_avg"),
    )


@register(
    "agg_median_quantity",
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS median_qty,
               MIN(l_quantity) AS min_qty,
               MAX(l_quantity) AS max_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="A4 exact percentile: interpolated median (Spark percentile() == "
    "DuckDB quantile_cont). l_quantity is integer-valued so the midpoint "
    "interpolation is exactly representable -- bit-stable across engines.",
    tags=("aggregate", "percentile"),
)
def agg_median_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@register(
    "agg_collect_sorted_types",
    oracle="""
        SELECT user_id,
               array_agg(DISTINCT event_type ORDER BY event_type) AS types_seen
        FROM events
        GROUP BY user_id
    """,
    doc="A4 collect aggregate made deterministic: collect_set + sort_array "
    "(unordered collect_list output would never hash-match across engines).",
    tags=("aggregate", "collect"),
)
def agg_collect_sorted_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("types_seen")
    )


@register(
    "agg_conditional_counts",
    oracle="""
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases,
               COUNT(*) FILTER (WHERE event_type = 'error') AS errors,
               COUNT(*) AS total
        FROM events
        GROUP BY user_id
    """,
    doc="A4 conditional aggregation (count_if / FILTER clause): several "
    "filtered measures in ONE scan+shuffle instead of N filtered subqueries.",
    tags=("aggregate", "conditional"),
)
def agg_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "purchase").alias("purchases"),
        F.count_if(F.col("event_type") == "error").alias("errors"),
        F.count(F.lit(1)).alias("total"),
    )


#: Salt fan-out for the skew-salted aggregation below.
SALT_BUCKETS = 16


@register(
    "agg_salted_skew",
    oracle=f"""
        SELECT event_type,
               COUNT(*) AS events,
               {det.oracle_dsum("value")} AS total_value
        FROM events
        GROUP BY event_type
    """,
    doc="Skew-salted two-phase aggregation: event_type has ~4 distinct "
    "values over the whole corpus -- the worst-case hot-key shape, where "
    "a naive groupBy funnels everything through 4 reducers. Phase 1 "
    "groups by (key, salt) with a deterministic row-derived salt "
    "(event_id % 16) spreading each hot key over 16 reducers; phase 2 "
    "re-aggregates the 4x16 partials. COUNT re-aggregates by SUM; the "
    "decimal sums are associative, so the result is bit-identical to the "
    "direct groupBy -- which is exactly what the oracle computes, proving "
    "the rewrite is semantics-preserving. At 100 TB this turns one "
    "straggler reducer into uniform parallelism for the price of a "
    "second (tiny: keys x salts rows) shuffle.",
    bench=True,
    tags=("aggregate", "skew", "salting"),
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    # phase 1: salt spreads each hot key over SALT_BUCKETS reducers.
    # Decimal partials (not doubles) so the phase-2 re-sum stays exact.
    partial = (
        ev.withColumn("salt", F.col("event_id") % SALT_BUCKETS)
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("value").cast("decimal(27,6)")).alias("s"),
        )
    )
    # phase 2: keys x salts rows -- negligible; re-sum exact decimals.
    return partial.groupBy("event_type").agg(
        F.sum("c").alias("events"),
        F.sum("s").cast("double").alias("total_value"),
    )


@register(
    "quality_referential_summary",
    oracle="""
        SELECT
            (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
                AS null_custkeys,
            (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
                                   GROUP BY o_orderkey HAVING COUNT(*) > 1))
                AS dup_orderkeys,
            (SELECT COUNT(*) FROM orders o
             WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
                   (SELECT 1 FROM customer c
                    WHERE c.c_custkey = o.o_custkey))
                AS orphan_orders
    """,
    doc="D3 data-quality checks as a single queryable summary row: "
    "not_null + unique + relationships over orders/customer (the "
    "dbt-test stage, bitcoin_pipeline_dag.py:38-41, rendered as one "
    "DataFrame instead of driver-side booleans -- quality/checks.py "
    "provides the imperative gate variant). Each check is one aggregate "
    "or anti-join; the three 1-row results cross-join for free.",
    tags=("quality", "dq"),
)
def quality_referential_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nulls = orders.where(F.col("o_custkey").isNull()).agg(
        F.count(F.lit(1)).alias("null_custkeys")
    )
    dups = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("dup_orderkeys"))
    )
    orphans = (
        orders.where(F.col("o_custkey").isNotNull())
        .join(
            customer.select(F.col("c_custkey").alias("o_custkey")).distinct(),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("orphan_orders"))
    )
    return nulls.crossJoin(dups).crossJoin(orphans)
