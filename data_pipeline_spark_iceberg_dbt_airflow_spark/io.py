"""Table IO: readers over the driver testdata, writers with Iceberg fallback.

The reference stores everything as Iceberg-over-Parquet
(`/root/reference/Iceberg-dbt-project/scripts/extract_bitcoin_prices.py:131-145,193`).
Here the default is plain Parquet (the driver testdata format, TESTDATA.md);
``write_table`` upgrades to the Iceberg V2 writer when a catalog is present,
reproducing the reference's append (S6) and CTAS (S8) sinks.

Scale notes: `spark.read.parquet` is a DataSource-V2 scan -- predicate
pushdown, column pruning, and partition pruning are free as long as callers
express filters/projections declaratively (verified in tests via
`explain()` containing PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: All tables the driver generates (TESTDATA.md / FIXTURES.md §B).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


#: (path) -> list of column names stored as TIMESTAMP(NANOS) in the footer.
_NANOS_COLS_CACHE: dict[str, list[str]] = {}


def _nanos_columns(path: str) -> list[str]:
    """Columns written as nanosecond timestamps (Spark 4 rejects them raw)."""
    if path not in _NANOS_COLS_CACHE:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        _NANOS_COLS_CACHE[path] = [
            f.name for f in schema if str(f.type) == "timestamp[ns]"
        ]
    return _NANOS_COLS_CACHE[path]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table (S7: table scan).

    Parquet TIMESTAMP(NANOS) columns (events.ts, lineitem.l_shipdate) are
    illegal for Spark 4's vectorized reader; we read them as raw INT64
    nanos (`spark.sql.legacy.parquet.nanosAsLong`) and floor-convert to
    microsecond TimestampType JVM-side (`x DIV 1000` keeps full integer
    precision). DuckDB's parquet reader truncates ns->us the same way, so
    both engines see identical instants. The conversion is a cheap
    projection inside whole-stage codegen; pushdown on other columns is
    unaffected.
    """
    path = table_path(sf_dir, name)
    ns_cols = _nanos_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register temp views so SQL-form queries can run (entry point C,
    SURVEY.md §3.3)."""
    for n in names:
        read_table(spark, sf_dir, n).createOrReplaceTempView(n)


def write_table(
    df: DataFrame,
    target: str,
    *,
    mode: str = "append",
    partition_by: list[str] | None = None,
    use_iceberg: bool = False,
) -> None:
    """Write a table, mirroring the reference's two sinks.

    - ``mode='append'`` = Iceberg append (extract_bitcoin_prices.py:193, S6)
    - ``mode='replace'`` = dbt table materialization, i.e.
      ``CREATE OR REPLACE TABLE ... AS SELECT`` (README.md:370,388, S8)

    With ``use_iceberg`` the DataFrameWriterV2 path is used (ACID snapshot
    commit); otherwise Parquet directories, partitioned when asked --
    the Parquet rendering of Iceberg's hidden day partitioning (S10).
    """
    if use_iceberg:
        writer = df.writeTo(target)
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "append":
            writer.append()
        else:
            writer.createOrReplace()
        return
    w = df.write.mode("overwrite" if mode == "replace" else mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)
