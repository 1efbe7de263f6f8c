"""Streaming-shaped aggregations, batch-checkable (SURVEY.md §2.9, [ext]).

The reference is strictly batch -- "streaming" is Airflow's @hourly
append (/root/reference/Iceberg-dbt-project/dags/bitcoin_pipeline_dag.py:19)
-- but the capability envelope includes event-time windowing. These
queries use the STREAMING operators (``F.window``, ``F.session_window``)
in batch mode over ``events``, which is exactly how Structured Streaming
executes them per micro-batch; the DuckDB oracle proves the event-time
semantics. The genuinely-streaming runtime pieces (watermark, state,
incremental triggers) live in ``streaming/jobs.py`` and are exercised by
pytest with real readStream/writeStream runs against the same batch
results.

Registry budget note (round 3): tumbling + sliding merged into one
two-branch query (kind marker; both branches group by (window,
event_type) so the schemas align); session windows keep their own entry.

Scale notes: windowed groupBys are ordinary partial+final HashAggregates
on (window, keys) -- one shuffle; the sliding window multiplies rows by
window/slide (here 2x) BEFORE the partial agg, which is the documented
cost of overlap. Session windows shuffle once on the session keys and
merge per-key sorted runs; skewed users are the risk at 100 TB (AQE skew
splitting cannot split one key -- salting by day first if a key is
pathological).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import det
from ..io import read_table
from .registry import register

#: Session gap: ~7 h median inter-event gap per user in the testdata, so a
#: 6 h gap yields a meaningful mix of merged and singleton sessions.
SESSION_GAP = "6 hours"


@register(
    "stream_time_windows",
    oracle=f"""
        SELECT 'tumbling' AS kind,
               time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP)) AS win_start,
               time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP))
                   + INTERVAL 1 DAY AS win_end,
               event_type,
               COUNT(*) AS events,
               {det.oracle_dsum("value")} AS total_value
        FROM events
        WHERE ts IS NOT NULL
        GROUP BY 2, 3, 4
        UNION ALL
        SELECT 'sliding' AS kind, win_start, win_start + INTERVAL 1 DAY AS win_end,
               event_type, COUNT(*) AS events,
               {det.oracle_dsum("value")} AS total_value
        FROM (
            SELECT CAST(ts AS TIMESTAMP) AS ts, value, event_type,
                   time_bucket(INTERVAL 12 HOUR, CAST(ts AS TIMESTAMP))
                       - k.k * INTERVAL 12 HOUR AS win_start
            FROM events
            CROSS JOIN (SELECT unnest(range(2)) AS k) k
            WHERE ts IS NOT NULL)
        GROUP BY 2, 3, 4
        UNION ALL
        SELECT 'rollup' AS kind,
               time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP)) AS win_start,
               time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP))
                   + INTERVAL 1 DAY AS win_end,
               event_type,
               COUNT(*) AS events,
               {det.oracle_dsum("value")} AS total_value
        FROM events
        WHERE ts IS NOT NULL
        GROUP BY 2, 3, 4
    """,
    doc="T1 tumbling + sliding event-time windows, consolidated (was "
    "stream_tumbling_daily + stream_sliding_day_half): kind='tumbling' "
    "buckets per-day per-type counts and deterministic sums via "
    "F.window(ts, '1 day') -- identical semantics batch or micro-batch "
    "(epoch-aligned buckets in both engines); kind='sliding' runs the "
    "same measures over F.window(ts, '1 day', '12 hours'), each event "
    "landing in window/slide = 2 overlapping windows -- Spark expands "
    "rows BEFORE the partial aggregate (the oracle mirrors the expansion "
    "with an explicit 2-way shift-join). Overlap factor is the scale "
    "cost knob. kind='rollup' (round 4) is the continuous-aggregate "
    "pattern: the DAILY result is re-aggregated FROM HOURLY partials "
    "(counts sum; value partials stay in exact DECIMAL until the final "
    "cast, so re-aggregation is lossless by construction) while the "
    "oracle states the direct daily formula -- the hash match proves "
    "coarse rollups can reuse a materialized fine-grained aggregate "
    "instead of rescanning raw events, which is how a 100 TB hypertable "
    "serves day/month/year resolutions off one hourly table.",
    bench=True,
    tags=("streaming", "window-agg"),
)
def stream_time_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No event time, no window: F.window DROPS null-ts rows; the filter
    # (and its oracle mirror) makes that streaming semantic explicit.
    ev = read_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())

    def _agg(windowed: DataFrame, kind: str) -> DataFrame:
        return windowed.agg(
            F.count(F.lit(1)).alias("events"),
            det.dsum("value").alias("total_value"),
        ).select(
            F.lit(kind).alias("kind"),
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "events",
            "total_value",
        )

    tumbling = _agg(ev.groupBy(F.window("ts", "1 day"), "event_type"), "tumbling")
    sliding = _agg(
        ev.groupBy(F.window("ts", "1 day", "12 hours"), "event_type"), "sliding"
    )
    # rollup: daily FROM hourly partials. The hourly level keeps the
    # value sum in exact DECIMAL (summing the cast-to-double hourly
    # results instead would reintroduce order-dependent float error);
    # only the final daily value casts to double, so the two-level path
    # is bit-identical to the direct daily aggregate the oracle states.
    hourly = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("events"),
        F.sum(F.col("value").cast("decimal(27,6)")).alias("dec_value"),
    )
    rollup = (
        hourly.groupBy(
            F.window(F.col("window.start"), "1 day"), "event_type"
        )
        .agg(
            F.sum("events").alias("events"),
            F.sum("dec_value").cast("double").alias("total_value"),
        )
        .select(
            F.lit("rollup").alias("kind"),
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "events",
            "total_value",
        )
    )
    return tumbling.unionByName(sliding).unionByName(rollup)


@register(
    "stream_session_windows",
    oracle="""
        WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                   FROM events WHERE ts IS NOT NULL),
        marked AS (
            SELECT user_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w >= INTERVAL 6 HOUR
                        THEN 1 ELSE 0 END AS new_session
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        sessions AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked)
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 6 HOUR AS session_end,
               COUNT(*) AS events
        FROM sessions
        GROUP BY user_id, sid
    """,
    doc="T2 session windows: per-user activity sessions with a 6 h "
    "inactivity gap via F.session_window -- a session spans "
    "[first_event, last_event + gap). The oracle is the gaps-and-islands "
    "rendering (LAG >= gap marks a boundary; running sum numbers the "
    "islands), proving Spark's merge semantics including the >=-gap "
    "boundary. One shuffle on user_id.",
    bench=True,
    tags=("streaming", "session-window"),
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.session_window("ts", SESSION_GAP), "user_id")
        .agg(F.count(F.lit(1)).alias("events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "events",
        )
    )
