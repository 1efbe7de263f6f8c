"""Reference-surface queries (SURVEY.md §2.1-§2.2, §2.6-§2.7) mapped onto the
driver's ``events`` table.

FIXTURES.md maps the stream-shaped ``events`` table onto the reference's raw
table: ``ts / event_type / value`` ≅ ``extracted_at / source / price_usd``.
Each query here is a cited reference behavior re-expressed in PySpark; the
paired oracle is the same ANSI SQL DuckDB runs on the identical parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import det
from ..io import read_table, scan_time_range
from .registry import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events")


@register(
    "ref_staging_projection",
    oracle="""
        SELECT event_id,
               event_type AS data_source,
               COALESCE(value, 0) AS value_usd,
               CAST(ts AS DATE) AS extraction_date
        FROM events
    """,
    doc="stg_bitcoin_prices model shape (P1 rename, P2 coalesce, P3 derive; "
    "README.md:368-384) applied to events.",
    tags=("reference", "projection"),
)
def ref_staging_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.select(
        F.col("event_id"),
        F.col("event_type").alias("data_source"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value_usd"),
        F.to_date("ts").alias("extraction_date"),
    )


@register(
    "ref_fct_daily",
    oracle=f"""
        SELECT CAST(ts AS DATE) AS extraction_date,
               event_type AS data_source,
               MIN(value) AS min_price_usd,
               MAX(value) AS max_price_usd,
               {det.oracle_davg("value")} AS avg_price_usd,
               COUNT(*) AS records
        FROM (SELECT ts, event_type, COALESCE(value, 0) AS value FROM events)
        GROUP BY 1, 2
    """,
    doc="FLAGSHIP: fct_bitcoin_daily (A1 grouped MIN/MAX/AVG/COUNT; "
    "README.md:386-400) over the staged events. AVG uses the engine's "
    "deterministic exact-decimal accumulation (functions/det.py).",
    bench=True,
    tags=("reference", "aggregate"),
)
def ref_fct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    stg = ev.select(
        F.to_date("ts").alias("extraction_date"),
        F.col("event_type").alias("data_source"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("price_usd"),
    )
    return stg.groupBy("extraction_date", "data_source").agg(
        F.min("price_usd").alias("min_price_usd"),
        F.max("price_usd").alias("max_price_usd"),
        det.davg("price_usd").alias("avg_price_usd"),
        F.count(F.lit(1)).alias("records"),
    )


@register(
    "ref_topk_latest",
    oracle="""
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        FROM events
        ORDER BY ts DESC, event_id DESC
        LIMIT 5
    """,
    doc="O1 verification read-back: ORDER BY ts DESC LIMIT 5 "
    "(extract_bitcoin_prices.py:203); event_id tiebreak for determinism. "
    "Physical plan: TakeOrderedAndProject, no global sort.",
    tags=("reference", "topk"),
)
def ref_topk_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(5)
        .select("event_id", "ts", "event_type", "value")
    )


@register(
    "ref_limit_scan",
    oracle="""
        SELECT event_id, event_type FROM events ORDER BY event_id LIMIT 10
    """,
    doc="O2 spot-check LIMIT 10 (README.md:297), made deterministic by "
    "ordering on the key.",
    tags=("reference", "topk"),
)
def ref_limit_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.orderBy("event_id").limit(10).select("event_id", "event_type")


@register(
    "ref_identity_star",
    oracle="SELECT * FROM region",
    doc="P4 identity projection: SELECT * verification read (README.md:297).",
    tags=("reference", "projection"),
)
def ref_identity_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "region").select("*")


@register(
    "ref_union_sources",
    oracle="""
        SELECT event_id, 'feed_a' AS source, value AS price_usd FROM events
        WHERE event_type = 'click'
        UNION ALL
        SELECT event_id, 'feed_b' AS source,
               CAST(CAST(value * 0.85 AS DECIMAL(27,6)) AS DOUBLE) AS price_usd
        FROM events WHERE event_type = 'view'
        UNION ALL
        SELECT event_id, 'feed_c' AS source, CAST(NULL AS DOUBLE) AS price_usd
        FROM events WHERE event_type = 'error'
    """,
    doc="§2.7 multi-source batch assembly: the extractor's 3-way list append "
    "(extract_bitcoin_prices.py:150-172) incl. S2's fixed-FX derivation "
    "(*0.85, :84) and S3's NULL padding (:109-111). The branches are disjoint "
    "filters over ONE table, so the Spark plan multiplexes a SINGLE scan with "
    "CASE projections instead of the literal 3-scan UNION ALL (at 100 TB a "
    "triple scan of the same source is pure waste); the oracle keeps the "
    "UNION ALL form -- identical rows, different physical strategy.",
    tags=("reference", "setop"),
)
def ref_union_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    et = F.col("event_type")
    return ev.filter(et.isin("click", "view", "error")).select(
        "event_id",
        F.when(et == "click", F.lit("feed_a"))
        .when(et == "view", F.lit("feed_b"))
        .otherwise(F.lit("feed_c"))
        .alias("source"),
        F.when(et == "click", F.col("value"))
        .when(
            et == "view",
            # decimal-cast instead of ROUND: identical half-boundary behavior
            # in Spark and DuckDB (functions/det.py rationale)
            (F.col("value") * F.lit(0.85)).cast("decimal(27,6)").cast("double"),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("price_usd"),
    )


@register(
    "ref_time_range_pruned",
    oracle="""
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
          AND ts <  TIMESTAMP '2024-01-20 00:00:00'
    """,
    doc="P5/S7 time-range scan with the predicate PUSHED into the parquet "
    "reader: the engine analog of the reference's hidden day-partition "
    "pruning (days(extracted_at), extract_bitcoin_prices.py:144). The ns "
    "timestamp is compared as raw INT64 bounds before conversion, so parquet "
    "row-group min/max stats skip everything outside the window -- the 100 TB "
    "make-or-break for time-series queries (plan asserted in tests).",
    tags=("reference", "filter", "pruning"),
)
def ref_time_range_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = scan_time_range(
        spark, sf_dir, "events", "ts", "2024-01-10T00:00:00", "2024-01-20T00:00:00"
    )
    return df.select("event_id", "ts", "event_type", "value")


@register(
    "ref_filter_pushdown",
    oracle="""
        SELECT event_id, user_id, value
        FROM events
        WHERE event_type = 'purchase' AND value > 50
    """,
    doc="P5 [ext] filter: predicate + projection both push to the parquet "
    "scan (PushedFilters/ReadSchema verified in tests).",
    tags=("reference", "filter"),
)
def ref_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 50)).select(
        "event_id", "user_id", "value"
    )
