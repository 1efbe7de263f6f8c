"""Data-quality checks -- the dbt-test stage as DataFrame assertions.

The reference runs ``dbt test`` as a first-class DAG stage gating every
hourly pipeline run (/root/reference/Iceberg-dbt-project/dags/
bitcoin_pipeline_dag.py:38-41), but ships no schema.yml, so its declared
suite is empty (SURVEY.md §5 caveat). This module implements the four
canonical dbt checks its models imply -- not_null, unique,
accepted_values, relationships -- natively over DataFrames.

Each check compiles to ONE aggregate or anti-join returning a failing-row
count -- the same single-pass shape dbt's generated test SQL has, and the
only shape that scales: a check never collects rows, only a count (a
debugging variant could limit-sample the failures).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CheckResult:
    check: str
    column: str
    passed: bool
    failing_rows: int

    def __str__(self) -> str:  # dbt-style one-liner
        status = "PASS" if self.passed else f"FAIL ({self.failing_rows})"
        return f"{self.check}({self.column}): {status}"


def not_null(df: DataFrame, column: str) -> CheckResult:
    """dbt ``not_null``: no NULLs in ``column``."""
    n = df.where(F.col(column).isNull()).count()
    return CheckResult("not_null", column, n == 0, n)


def unique(df: DataFrame, column: str) -> CheckResult:
    """dbt ``unique``: no value occurs twice (NULLs ignored, as dbt does).

    Counted as sum of (occurrences - 1) over duplicated values: one
    map-side-combinable groupBy on the column, no full-row shuffle.
    """
    dup = (
        df.where(F.col(column).isNotNull())
        .groupBy(column)
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("extra"))
        .collect()[0]["extra"]
    )
    return CheckResult("unique", column, dup == 0, int(dup))


def accepted_values(
    df: DataFrame, column: str, values: Sequence[str]
) -> CheckResult:
    """dbt ``accepted_values``: every non-NULL value is in ``values``.

    The canonical instance here: data_source in {coingecko, coincap,
    blockchain_info} (extract_bitcoin_prices.py:56,81,104).
    """
    n = (
        df.where(F.col(column).isNotNull())
        .where(~F.col(column).isin(*values))
        .count()
    )
    return CheckResult("accepted_values", column, n == 0, n)


def relationships(
    df: DataFrame, column: str, ref_df: DataFrame, ref_column: str
) -> CheckResult:
    """dbt ``relationships``: every non-NULL value exists in the parent
    table -- a LEFT ANTI join (probe side never shuffles when the parent
    key set broadcasts)."""
    parent = ref_df.select(F.col(ref_column).alias(column)).distinct()
    n = (
        df.where(F.col(column).isNotNull())
        .select(column)
        .join(parent, column, "left_anti")
        .count()
    )
    return CheckResult("relationships", column, n == 0, n)


def expression(df: DataFrame, expr: str) -> CheckResult:
    """dbt-utils ``expression_is_true``: every row satisfies a SQL
    predicate (e.g. ``"o_totalprice >= 0"``). NULL predicates count as
    failures -- a constraint a row cannot prove is a constraint it
    fails, matching dbt's generated ``WHERE NOT (expr)`` plus explicit
    NULL handling. Same one-aggregate shape as the other checks."""
    n = df.where(~F.coalesce(F.expr(expr), F.lit(False))).count()
    return CheckResult("expression", expr, n == 0, n)


def run_checks(results: Sequence[CheckResult]) -> bool:
    """dbt-test gate semantics: True iff every check passed (the DAG edge
    that blocks downstream tasks, bitcoin_pipeline_dag.py:44)."""
    return all(r.passed for r in results)
