"""Reshape operators: pivot (long->wide) and unpivot/melt (wide->long).

Part of the exposed Spark SQL surface (SURVEY.md §2 envelope; the reference
reaches it through spark-sql / Thrift, /root/reference/Iceberg-dbt-project/
docker-compose.yml:126-146). The DuckDB oracle renders pivot as ANSI
conditional aggregation and unpivot as UNION ALL, so both stay
hash-checkable.

Scale design (100 TB):
- ``pivot`` is given its value list EXPLICITLY. Without it Spark first runs
  a distinct-values collect job over the full table -- an extra scan plus a
  driver-side collect that can OOM on a high-cardinality pivot column. With
  the list, pivot compiles to one partial+final HashAggregate whose
  aggregate expressions are per-value conditionals: a single shuffle, same
  budget as a plain groupBy.
- ``unpivot`` is a zero-shuffle projection (each input row fans out to K
  output rows map-side); the UNION-ALL oracle would scan K times, Spark
  scans once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import det
from ..io import read_table
from .registry import register

_STATUSES = ("F", "O", "P")


@register(
    "reshape_pivot_status_revenue",
    oracle=f"""
        SELECT o_orderpriority,
               {det.oracle_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END", 2)} AS revenue_f,
               {det.oracle_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END", 2)} AS revenue_o,
               {det.oracle_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END", 2)} AS revenue_p
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Pivot order revenue long->wide: one row per priority, one column "
    "per order status. Explicit pivot values skip the distinct-scan job; "
    "the whole reshape is one hash aggregation with conditional sums "
    "(exact-decimal, det.py).",
    tags=("reshape", "pivot"),
)
def reshape_pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivoted = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(_STATUSES))
        .agg(det.dsum("o_totalprice", 2))
    )
    return pivoted.select(
        "o_orderpriority",
        *[F.col(s).alias(f"revenue_{s.lower()}") for s in _STATUSES],
    )


@register(
    "reshape_unpivot_part_metrics",
    oracle="""
        SELECT p_partkey, 'retailprice' AS metric,
               p_retailprice AS metric_value
        FROM part
        UNION ALL
        SELECT p_partkey, 'size' AS metric,
               CAST(p_size AS DOUBLE) AS metric_value
        FROM part
    """,
    doc="Unpivot/melt part attributes wide->long: (p_partkey, metric, "
    "metric_value) rows. Spark's unpivot fans rows out map-side in a "
    "single scan -- no shuffle, no union of re-scans (the UNION ALL is "
    "only the oracle's rendering).",
    tags=("reshape", "unpivot"),
)
def reshape_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["retailprice", "size"],
        variableColumnName="metric",
        valueColumnName="metric_value",
    )
