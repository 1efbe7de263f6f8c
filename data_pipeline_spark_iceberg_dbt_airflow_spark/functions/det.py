"""Deterministic float aggregation helpers.

Floating-point SUM/AVG are order-dependent: at cluster scale, partial
aggregation + AQE make partition order nondeterministic, so two runs (or two
engines) can disagree in the last bits, and decimal ROUND can then flip at a
half boundary -- the classic differential-testing trap (SURVEY.md §7 risks).

The fix used across this engine: accumulate in exact DECIMAL and cast the
final value back to DOUBLE.

    dsum(x)  = CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)
    davg(x)  = dsum(x) / COUNT(x)

Because the testdata's doubles are exact <=6-decimal quantities (prices,
discounts, and their small products), the DECIMAL cast is lossless, the sum
is exact and order-independent, and the final double is bit-identical no
matter which engine or plan computed it. The oracle SQL uses the same
formula verbatim. Variance/stddev are derived from exact sums of x and x^2
(scale 8 covers squared 4-decimal values).

Cost note: the plan shape is identical to a double sum (one map-side-
combinable HashAggregate, one shuffle of tiny partials), but the per-row
cost is not free: sum buffers wider than DECIMAL(18) take Spark's
non-compact (BigDecimal-backed) path, measured ~2-3x a double sum at
sf0.1 (e.g. the 8-measure Q1 aggregate: ~0.5s double vs ~1.8s decimal).
That multiplier is flat in data size and buys order-independence, which
double sums cannot provide at any price -- at 100 TB the aggregate is
scan-bound and the trade disappears into IO; don't "optimize" it back to
doubles, the differential gate will catch the last-bit drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: str | Column, scale: int = 6, precision: int = 27) -> Column:
    """Order-independent SUM over doubles (exact decimal accumulation)."""
    return F.sum(_c(col).cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: str | Column, scale: int = 6, precision: int = 27) -> Column:
    """Order-independent AVG: exact-sum double / non-null count."""
    return dsum(col, scale, precision) / F.count(_c(col))


def dsum_sq(col: str | Column, scale: int = 8, precision: int = 30) -> Column:
    """Exact sum of squares (for deterministic variance/stddev)."""
    c = _c(col)
    return F.sum((c * c).cast(f"decimal({precision},{scale})")).cast("double")


def dvar_samp(col: str | Column) -> Column:
    """Deterministic sample variance from exact sums:
    (n*Σx² − (Σx)²) / (n*(n−1)). NULL when n < 2 (matches var_samp)."""
    n = F.count(_c(col)).cast("double")
    sx = dsum(col)
    sxx = dsum_sq(col)
    return F.when(n > 1, (n * sxx - sx * sx) / (n * (n - 1))).otherwise(F.lit(None))


def dstddev_samp(col: str | Column) -> Column:
    return F.sqrt(dvar_samp(col))


def dsum_cube(col: str | Column, scale: int = 9, precision: int = 33) -> Column:
    """Exact sum of cubes (for deterministic skewness)."""
    c = _c(col)
    return F.sum((c * c * c).cast(f"decimal({precision},{scale})")).cast("double")


def dskew_samp(col: str | Column) -> Column:
    """Deterministic adjusted sample skewness (Fisher-Pearson G1) from
    exact power sums. Every double operation after the exact sums is
    written as the IDENTICAL expression tree in :func:`oracle_dskew_samp`
    -- including ``m2 * sqrt(m2)`` instead of ``pow(m2, 1.5)``, because
    sqrt/multiply are IEEE-correctly-rounded everywhere while libm pow
    may differ in the last ulp between engines. NULL when n <= 2 or the
    variance is 0 (constant group)."""
    c = _c(col)
    n = F.count(c).cast("double")
    s1, s2, s3 = dsum(col), dsum_sq(col), dsum_cube(col)
    m = s1 / n
    m2 = s2 / n - m * m
    m3 = s3 / n - 3 * m * (s2 / n) + 2 * m * m * m
    return F.when(
        (n > 2) & (m2 > 0),
        (F.sqrt(n * (n - 1)) / (n - 2)) * (m3 / (m2 * F.sqrt(m2))),
    ).otherwise(F.lit(None))


def oracle_dsum(expr: str, scale: int = 6, precision: int = 27) -> str:
    """The oracle-SQL rendering of ``dsum`` (identical formula for DuckDB)."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def oracle_davg(expr: str, scale: int = 6, precision: int = 27) -> str:
    return f"({oracle_dsum(expr, scale, precision)} / COUNT({expr}))"


def oracle_dsum_sq(expr: str, scale: int = 8, precision: int = 30) -> str:
    return (
        f"CAST(SUM(CAST((({expr}) * ({expr})) AS DECIMAL({precision},{scale})))"
        " AS DOUBLE)"
    )


def oracle_dvar_samp(expr: str) -> str:
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    sx = oracle_dsum(expr)
    sxx = oracle_dsum_sq(expr)
    return (
        f"(CASE WHEN {n} > 1 THEN ({n} * {sxx} - {sx} * {sx}) / ({n} * ({n} - 1))"
        " ELSE NULL END)"
    )


def oracle_dstddev_samp(expr: str) -> str:
    return f"SQRT({oracle_dvar_samp(expr)})"


def dsum_quart(
    col: str | Column, scale: int = 12, precision: int = 28
) -> Column:
    """Exact sum of fourth powers (for deterministic kurtosis)."""
    c = _c(col)
    return F.sum(
        (c * c * c * c).cast(f"decimal({precision},{scale})")
    ).cast("double")


def dkurt_samp(col: str | Column) -> Column:
    """Deterministic adjusted excess kurtosis (sample G2) from exact
    power sums; identical expression tree in :func:`oracle_dkurt_samp`.
    NULL when n <= 3 or the variance is 0."""
    c = _c(col)
    n = F.count(c).cast("double")
    s1, s2, s3, s4 = dsum(col), dsum_sq(col), dsum_cube(col), dsum_quart(col)
    m = s1 / n
    m2 = s2 / n - m * m
    m4 = s4 / n - 4 * m * (s3 / n) + 6 * m * m * (s2 / n) - 3 * m * m * m * m
    return F.when(
        (n > 3) & (m2 > 0),
        ((n + 1) * (m4 / (m2 * m2) - 3) + 6)
        * ((n - 1) / ((n - 2) * (n - 3))),
    ).otherwise(F.lit(None))


def oracle_dsum_cube(expr: str, scale: int = 9, precision: int = 33) -> str:
    return (
        f"CAST(SUM(CAST((({expr}) * ({expr}) * ({expr}))"
        f" AS DECIMAL({precision},{scale}))) AS DOUBLE)"
    )


def oracle_dskew_samp(expr: str) -> str:
    """Identical expression tree to :func:`dskew_samp` (operation order
    and association included -- bit-for-bit double parity)."""
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    s1, s2, s3 = oracle_dsum(expr), oracle_dsum_sq(expr), oracle_dsum_cube(expr)
    m = f"({s1} / {n})"
    s2n = f"({s2} / {n})"
    m2 = f"({s2n} - {m} * {m})"
    m3 = f"({s3} / {n} - 3 * {m} * {s2n} + 2 * {m} * {m} * {m})"
    return (
        f"(CASE WHEN {n} > 2 AND {m2} > 0 THEN"
        f" (SQRT({n} * ({n} - 1)) / ({n} - 2)) * ({m3} / ({m2} * SQRT({m2})))"
        " ELSE NULL END)"
    )


def oracle_dsum_quart(expr: str, scale: int = 12, precision: int = 28) -> str:
    return (
        f"CAST(SUM(CAST((({expr}) * ({expr}) * ({expr}) * ({expr}))"
        f" AS DECIMAL({precision},{scale}))) AS DOUBLE)"
    )


def oracle_dkurt_samp(expr: str) -> str:
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    s2, s3, s4 = oracle_dsum_sq(expr), oracle_dsum_cube(expr), oracle_dsum_quart(expr)
    m = f"({oracle_dsum(expr)} / {n})"
    s2n = f"({s2} / {n})"
    s3n = f"({s3} / {n})"
    m2 = f"({s2n} - {m} * {m})"
    m4 = (
        f"({s4} / {n} - 4 * {m} * {s3n} + 6 * {m} * {m} * {s2n}"
        f" - 3 * {m} * {m} * {m} * {m})"
    )
    return (
        f"(CASE WHEN {n} > 3 AND {m2} > 0 THEN"
        f" (({n} + 1) * ({m4} / ({m2} * {m2}) - 3) + 6)"
        f" * (({n} - 1) / (({n} - 2) * ({n} - 3)))"
        " ELSE NULL END)"
    )
