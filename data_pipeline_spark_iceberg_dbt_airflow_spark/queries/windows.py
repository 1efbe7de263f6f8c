"""Window functions (SURVEY.md §2.5, all [ext]).

The reference has no OVER clause; the survey's flagged target is computing
the 24h change natively via ``lag`` instead of ingesting it pre-computed
(/root/reference/Iceberg-dbt-project/scripts/extract_bitcoin_prices.py:63,88).
Three families: ranking (row_number/rank/dense_rank/ntile), analytic
(lag/lead/first/last), and frames (rowsBetween/rangeBetween rolling aggs).

Registry budget note (round 3): 3 consolidated entries (was 8), one per
base relation -- every window FUNCTION from the original 8 still runs, as
columns of the same query sharing (or explicitly contrasting) window
specs. Sharing a partition key across several functions is itself the
scale-correct shape: one exchange serves every column.

Determinism discipline: every orderBy inside a window carries a unique
tiebreak column (event_id / orderkey) wherever the function's result depends
on row order (row_number, ntile, lag/lead, frame membership); pure
value-functions (rank over the bare value) need none. Rolling sums/avgs
accumulate in exact DECIMAL (functions/det.py) so both engines agree bitwise.

Scale notes: a window = one shuffle on its partition keys + a per-partition
sort. Keys here (event_type, user_id, o_orderpriority, o_custkey) are
low-skew; single-partition windows (no partitionBy) are avoided except on
already-tiny aggregates (daily rows), never on raw facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import det
from ..io import read_table
from .registry import register


@register(
    "window_events_family",
    oracle="""
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn_latest,
               epoch_us(CAST(ts AS TIMESTAMP))
                 - epoch_us(LAG(CAST(ts AS TIMESTAMP)) OVER w) AS gap_prev_us,
               epoch_us(LEAD(CAST(ts AS TIMESTAMP)) OVER w)
                 - epoch_us(CAST(ts AS TIMESTAMP)) AS gap_next_us,
               FIRST_VALUE(event_type) OVER wf AS first_type,
               LAST_VALUE(event_type) OVER wf AS last_type,
               MIN(value) OVER w3 AS min_3,
               MAX(value) OVER w3 AS max_3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
               wf AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING),
               w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    doc="W1 + W2 + W3 per-event window family, consolidated (was "
    "window_rownum_latest_per_user + window_lead_lag_gaps + "
    "window_first_last_per_user + window_rolling_3row_minmax): rn_latest "
    "ranks each user's events newest-first (rn_latest=1 is the canonical "
    "dedup-to-latest filter); gap_prev/next_us are microsecond lag/lead "
    "gaps (session-gap precursor, integer epoch math -- no float drift); "
    "first/last_type read the unbounded frame; min_3/max_3 the 3-row "
    "rolling frame. All windows share ONE partition key (user_id), so "
    "Catalyst plans a single exchange feeding per-sort Window nodes -- "
    "the shape to prefer at 100 TB over one query per function.",
    tags=("window", "ranking", "analytic", "frame"),
)
def window_events_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w_desc = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    # asc_nulls_last: Spark's ASC default is NULLS FIRST, DuckDB's (and
    # the analytic convention) is NULLS LAST -- alignment matters the
    # moment the ordering column is nullable (null-injection sweep).
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), "event_id"
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w3 = w.rowsBetween(-2, 0)
    # Cast-at-use: unix_micros requires instant (session-TZ) timestamps;
    # µs parquet arrives as TIMESTAMP_NTZ. The cast is a projection here,
    # never an obstacle to scan pruning (see io._normalize_ntz).
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.row_number().over(w_desc).alias("rn_latest"),
        (us - F.lag(us).over(w)).alias("gap_prev_us"),
        (F.lead(us).over(w) - us).alias("gap_next_us"),
        F.first("event_type").over(wf).alias("first_type"),
        F.last("event_type").over(wf).alias("last_type"),
        F.min("value").over(w3).alias("min_3"),
        F.max("value").over(w3).alias("max_3"),
    )


@register(
    "window_orders_ranking",
    oracle="""
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               RANK() OVER wv AS price_rank,
               DENSE_RANK() OVER wv AS price_dense_rank,
               NTILE(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
               PERCENT_RANK() OVER wv AS price_pct_rank,
               CUME_DIST() OVER wv AS price_cume_dist,
               NTH_VALUE(o_totalprice, 2) OVER
                   (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS second_price,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) OVER
                    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS spend_to_date
        FROM orders
        WINDOW wv AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC)
    """,
    doc="W1 ranking family + W3 cumulative frame, consolidated (was "
    "window_rank_orders_by_price + window_running_total): rank/dense_rank "
    "depend only on the ordering VALUE (tie-stable, no tiebreak needed); "
    "ntile depends on row order so it carries the unique o_orderkey "
    "tiebreak; spend_to_date is the per-customer running spend with "
    "exact-decimal accumulation so prefix sums are order-stable across "
    "engines. Two window specs = two exchanges (priority, custkey) in one "
    "pass over orders -- still one scan.",
    tags=("window", "ranking", "frame"),
)
def window_orders_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w_val = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"))
    w_row = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_cum = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc_nulls_last("o_orderdate"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.rank().over(w_val).alias("price_rank"),
        F.dense_rank().over(w_val).alias("price_dense_rank"),
        F.ntile(4).over(w_row).alias("quartile"),
        # percent_rank/cume_dist are value-ranking functions (tie-stable);
        # (rank-1)/(n-1) and rank/n are integer-ratio doubles, so both
        # engines produce bit-identical values. nth_value depends on row
        # order -> unique tiebreak + explicit full frame (the default
        # frame would return NULL before row 2).
        F.percent_rank().over(w_val).alias("price_pct_rank"),
        F.cume_dist().over(w_val).alias("price_cume_dist"),
        F.nth_value("o_totalprice", 2)
        .over(
            w_row.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("second_price"),
        F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
        .over(w_cum)
        .cast("double")
        .alias("spend_to_date"),
    )


@register(
    "window_daily_trend",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num,
                   {det.oracle_dsum("value")} AS day_sum,
                   COUNT(value) AS day_cnt,
                   {det.oracle_davg("value")} AS avg_value
            FROM events GROUP BY 1, 2, 3
        )
        SELECT event_type, day, avg_value,
               (avg_value - LAG(avg_value) OVER wd)
                   / LAG(avg_value) OVER wd * 100 AS change_pct,
               CAST(SUM(CAST(day_sum AS DECIMAL(27,6))) OVER w7 AS DOUBLE)
                   / SUM(day_cnt) OVER w7 AS avg_7d
        FROM daily
        WINDOW wd AS (PARTITION BY event_type ORDER BY day),
               w7 AS (PARTITION BY event_type ORDER BY day_num
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    doc="W2 analytic lag + W3 RANGE frame over the daily rollup, "
    "consolidated (was window_lag_daily_change + window_rolling_7day_avg): "
    "change_pct is the day-over-day percent change computed NATIVELY -- "
    "the reference fetches change_24h_pct pre-computed from its APIs "
    "(extract_bitcoin_prices.py:63,88); avg_7d is a 7-day rolling average "
    "via rangeBetween(-6, 0) over an integer day number -- a true RANGE "
    "frame (missing days shrink the window), not a 7-ROW frame. Two-level "
    "shape: exact-decimal daily sums first (tiny), windows over the "
    "rollup -- at 100 TB the windows never touch raw rows.",
    bench=True,
    tags=("window", "analytic", "frame"),
)
def window_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type"),
        F.to_date("ts").alias("day"),
        F.unix_date(F.to_date("ts")).alias("day_num"),
    ).agg(
        det.dsum("value").alias("day_sum"),
        F.count("value").alias("day_cnt"),
        det.davg("value").alias("avg_value"),
    )
    wd = Window.partitionBy("event_type").orderBy(F.asc_nulls_last("day"))
    w7 = (
        Window.partitionBy("event_type")
        .orderBy(F.asc_nulls_last("day_num"))
        .rangeBetween(-6, 0)
    )
    prev = F.lag("avg_value").over(wd)
    rolling_sum = (
        F.sum(F.col("day_sum").cast("decimal(27,6)")).over(w7).cast("double")
    )
    return daily.select(
        "event_type",
        "day",
        "avg_value",
        ((F.col("avg_value") - prev) / prev * 100).alias("change_pct"),
        (rolling_sum / F.sum("day_cnt").over(w7)).alias("avg_7d"),
    )
