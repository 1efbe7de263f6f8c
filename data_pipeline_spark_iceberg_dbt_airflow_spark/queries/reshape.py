"""Reshape operators: pivot (long->wide) and unpivot/melt (wide->long).

Part of the exposed Spark SQL surface (SURVEY.md §2 envelope; the reference
reaches it through spark-sql / Thrift, /root/reference/Iceberg-dbt-project/
docker-compose.yml:126-146). ONE registry entry (round-3 budget): the
query pivots order revenue long->wide and immediately unpivots the wide
result back to long, so both reshapes execute inside a single checked
plan; the DuckDB oracle renders pivot as ANSI conditional aggregation and
unpivot as UNION ALL.

Scale design (100 TB):
- ``pivot`` is given its value list EXPLICITLY. Without it Spark first runs
  a distinct-values collect job over the full table -- an extra scan plus a
  driver-side collect that can OOM on a high-cardinality pivot column. With
  the list, pivot compiles to one partial+final HashAggregate whose
  aggregate expressions are per-value conditionals: a single shuffle, same
  budget as a plain groupBy.
- ``unpivot`` is a zero-shuffle projection (each input row fans out to K
  output rows map-side); here it runs over the tiny pivoted aggregate, so
  the round-trip costs one shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import det
from ..io import read_table
from .registry import register

_STATUSES = ("F", "O", "P")


@register(
    "reshape_pivot_unpivot",
    oracle=f"""
        WITH wide AS (
            SELECT o_orderpriority,
                   {det.oracle_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END", 2)} AS revenue_f,
                   {det.oracle_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END", 2)} AS revenue_o,
                   {det.oracle_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END", 2)} AS revenue_p
            FROM orders
            GROUP BY o_orderpriority)
        SELECT o_orderpriority, 'revenue_f' AS status_metric,
               revenue_f AS revenue FROM wide
        UNION ALL
        SELECT o_orderpriority, 'revenue_o' AS status_metric,
               revenue_o AS revenue FROM wide
        UNION ALL
        SELECT o_orderpriority, 'revenue_p' AS status_metric,
               revenue_p AS revenue FROM wide
    """,
    doc="Pivot + unpivot round-trip, consolidated (was "
    "reshape_pivot_status_revenue + reshape_unpivot_part_metrics): order "
    "revenue pivots long->wide (one row per priority, one exact-decimal "
    "conditional-sum column per order status -- explicit pivot values "
    "skip the distinct-scan job), then the wide result unpivots back to "
    "long (p_orderpriority, status_metric, revenue) through the real "
    "``unpivot`` API, NULL cells preserved -- proving both reshapes are "
    "lossless inverses inside one checked plan. Spark fans unpivot rows "
    "out map-side in a single pass (the UNION ALL re-scan is only the "
    "oracle's rendering).",
    tags=("reshape", "pivot", "unpivot"),
)
def reshape_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivoted = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(_STATUSES))
        .agg(det.dsum("o_totalprice", 2))
    )
    wide = pivoted.select(
        "o_orderpriority",
        *[F.col(s).alias(f"revenue_{s.lower()}") for s in _STATUSES],
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=[f"revenue_{s.lower()}" for s in _STATUSES],
        variableColumnName="status_metric",
        valueColumnName="revenue",
    )
