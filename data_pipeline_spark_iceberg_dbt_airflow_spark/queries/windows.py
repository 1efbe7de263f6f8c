"""Window functions (SURVEY.md §2.5, all [ext]).

The reference has no OVER clause; the survey's flagged target is computing
the 24h change natively via ``lag`` instead of ingesting it pre-computed
(/root/reference/Iceberg-dbt-project/scripts/extract_bitcoin_prices.py:63,88).
Three families: ranking (row_number/rank/dense_rank/ntile), analytic
(lag/lead/first/last), and frames (rowsBetween/rangeBetween rolling aggs).

Determinism discipline: every orderBy inside a window carries a unique
tiebreak column (event_id / orderkey) wherever the function's result depends
on row order (row_number, ntile, lag/lead, frame membership); pure
value-functions (rank over the bare value) need none. Rolling sums/avgs
accumulate in exact DECIMAL (functions/det.py) so both engines agree bitwise.

Scale notes: a window = one shuffle on its partition keys + a per-partition
sort. Keys here (event_type, user_id, o_orderpriority) are low-skew;
single-partition windows (no partitionBy) are avoided except on
already-tiny aggregates (daily rows), never on raw facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import det
from ..io import read_table
from .registry import register


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, day) deterministic daily averages (A1 shape)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(det.davg("value").alias("avg_value"))


_DAILY_ORACLE = f"""
    SELECT event_type, CAST(ts AS DATE) AS day,
           {det.oracle_davg("value")} AS avg_value
    FROM events GROUP BY 1, 2
"""


@register(
    "window_lag_daily_change",
    oracle=f"""
        WITH daily AS ({_DAILY_ORACLE})
        SELECT event_type, day, avg_value,
               (avg_value - LAG(avg_value) OVER w)
                   / LAG(avg_value) OVER w * 100 AS change_pct
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
    doc="W2 analytic lag: day-over-day percent change computed NATIVELY -- "
    "the reference fetches change_24h_pct pre-computed from its APIs "
    "(extract_bitcoin_prices.py:63,88); a lag window over the daily "
    "aggregate is the engine-side rendering. Window partitions are the "
    "(tiny) daily rollup, not raw events.",
    bench=True,
    tags=("window", "analytic"),
)
def window_lag_daily_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("avg_value").over(w)
    return daily.select(
        "event_type",
        "day",
        "avg_value",
        ((F.col("avg_value") - prev) / prev * 100).alias("change_pct"),
    )


@register(
    "window_rownum_latest_per_user",
    oracle="""
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                  ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
        WHERE rn = 1
    """,
    doc="W1 ranking: row_number top-1-per-group (latest event per user), the "
    "canonical dedup-to-latest pattern. event_id tiebreak makes rank order "
    "total; filter rn=1 prunes everything else before any downstream work.",
    tags=("window", "ranking"),
)
def window_rownum_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


@register(
    "window_rank_orders_by_price",
    oracle="""
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               RANK() OVER w AS price_rank,
               DENSE_RANK() OVER w AS price_dense_rank,
               NTILE(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey) AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC)
    """,
    doc="W1 ranking family: rank/dense_rank depend only on the ordering "
    "VALUE (tie-stable, no tiebreak needed); ntile depends on row order so "
    "it carries the unique o_orderkey tiebreak.",
    tags=("window", "ranking"),
)
def window_rank_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w_val = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"))
    w_row = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.rank().over(w_val).alias("price_rank"),
        F.dense_rank().over(w_val).alias("price_dense_rank"),
        F.ntile(4).over(w_row).alias("quartile"),
    )


@register(
    "window_lead_lag_gaps",
    oracle="""
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               epoch_us(CAST(ts AS TIMESTAMP))
                 - epoch_us(LAG(CAST(ts AS TIMESTAMP)) OVER w) AS gap_prev_us,
               epoch_us(LEAD(CAST(ts AS TIMESTAMP)) OVER w)
                 - epoch_us(CAST(ts AS TIMESTAMP)) AS gap_next_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="W2 analytic lag/lead: microsecond gaps between consecutive events "
    "per user (session-gap precursor). Integer epoch math -- no float "
    "drift across engines.",
    tags=("window", "analytic"),
)
def window_lead_lag_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (us - F.lag(us).over(w)).alias("gap_prev_us"),
        (F.lead(us).over(w) - us).alias("gap_next_us"),
    )


@register(
    "window_first_last_per_user",
    oracle="""
        SELECT DISTINCT user_id,
               FIRST_VALUE(event_type) OVER w AS first_type,
               LAST_VALUE(event_type) OVER w AS last_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="W2 first/last over an unbounded frame: each user's first and last "
    "event type. DISTINCT collapses the per-row window output to one row "
    "per user.",
    tags=("window", "analytic"),
)
def window_first_last_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    ).distinct()


@register(
    "window_rolling_3row_minmax",
    oracle="""
        SELECT event_id, user_id, value,
               MIN(value) OVER w AS min_3,
               MAX(value) OVER w AS max_3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    doc="W3 row frame: 3-row rolling min/max per user (rowsBetween -2..0). "
    "Frame membership is row-order-dependent, hence the event_id tiebreak.",
    tags=("window", "frame"),
)
def window_rolling_3row_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.min("value").over(w).alias("min_3"),
        F.max("value").over(w).alias("max_3"),
    )


@register(
    "window_rolling_7day_avg",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num,
                   {det.oracle_dsum("value")} AS day_sum,
                   COUNT(value) AS day_cnt
            FROM events GROUP BY 1, 2, 3
        )
        SELECT event_type, day,
               CAST(SUM(CAST(day_sum AS DECIMAL(27,6))) OVER w AS DOUBLE)
                   / SUM(day_cnt) OVER w AS avg_7d
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day_num
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    doc="W3 range frame: 7-day rolling average per event_type via "
    "rangeBetween(-6, 0) over an integer day number -- a true RANGE frame "
    "(missing days shrink the window), not a 7-ROW frame. Two-level shape: "
    "daily exact-decimal sums first (tiny), window over the rollup -- at "
    "100 TB the window never touches raw rows.",
    bench=True,
    tags=("window", "frame"),
)
def window_rolling_7day_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type"),
        F.to_date("ts").alias("day"),
        F.unix_date(F.to_date("ts")).alias("day_num"),
    ).agg(
        det.dsum("value").alias("day_sum"),
        F.count("value").alias("day_cnt"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_num")
        .rangeBetween(-6, 0)
    )
    rolling_sum = F.sum(F.col("day_sum").cast("decimal(27,6)")).over(w).cast("double")
    return daily.select(
        "event_type",
        "day",
        (rolling_sum / F.sum("day_cnt").over(w)).alias("avg_7d"),
    )


@register(
    "window_running_total",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) OVER
                    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS spend_to_date
        FROM orders
    """,
    doc="W3 cumulative frame: per-customer running spend, exact-decimal "
    "accumulation so the prefix sums are order-stable across engines.",
    tags=("window", "frame"),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
        .over(w)
        .cast("double")
        .alias("spend_to_date"),
    )
