"""SparkSession factory.

Mirrors the reference's session builder
(`/root/reference/Iceberg-dbt-project/scripts/extract_bitcoin_prices.py:13-37`)
minus the container endpoints: the reference wires an Iceberg REST catalog +
S3A/MinIO; we default to local Parquet and expose the Iceberg catalog configs
behind an opt-in flag so the same code runs when the runtime jar is present.

Scale notes (100 TB target):
- AQE is on: runtime partition coalescing, skew-join splitting, and
  broadcast-join demotion/promotion all apply without plan changes.
- ``spark.sql.shuffle.partitions`` defaults to the local core count for
  tests; on a real cluster set it ~2-3x total executor cores (or rely on
  AQE coalescing from a higher initial value).
- Session timezone is pinned to UTC: the reference stamps batches with
  UTC instants (extract_bitcoin_prices.py:151) and the DuckDB oracle
  compares naive-UTC timestamps.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "data-pipeline-spark-engine"


def default_parallelism() -> int:
    """Core count the driver harness asks us to use (SPARK_GRAFT_CPUS)."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark_session(
    app_name: str = DEFAULT_APP_NAME,
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    enable_iceberg: bool = False,
    iceberg_warehouse: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``enable_iceberg`` adds the Iceberg catalog configs the reference uses
    (extract_bitcoin_prices.py:23-30); it only works when the
    iceberg-spark-runtime jar is on the classpath, so it is opt-in.

    Session-wide contract: ``spark.sql.legacy.parquet.nanosAsLong=true`` is
    set HERE, deliberately and globally -- parquet TIMESTAMP(NANOS) columns
    (events.ts, lineitem.l_shipdate) arrive as raw INT64 nanos everywhere in
    the session. ``io.read_table`` converts them to microsecond timestamps;
    anything that needs a pushed-down time predicate filters on the raw longs
    first (``io.scan_time_range``). This replaces round-1's sticky per-read
    conf flip with an explicit session invariant.

    ``driver_memory`` only takes effect for the FIRST session in the process
    (the JVM is already up on ``getOrCreate`` reuse); a mismatch warns.
    """
    cpus = default_parallelism()
    active = SparkSession.getActiveSession()
    if active is not None and driver_memory is not None:
        current = active.conf.get("spark.driver.memory", "")
        if current and current != driver_memory:
            warnings.warn(
                f"driver_memory={driver_memory!r} ignored: session already "
                f"running with {current!r} (JVM memory is first-session-only)",
                stacklevel=2,
            )
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Scan-split sizing: maxSplitBytes = min(maxPartitionBytes,
        # max(openCostInBytes, totalBytes/parallelism)). The 4 MiB default
        # openCost caps a 10 MiB fact table at ~3 scan tasks on 32 cores;
        # 512 KiB lets small-SF inputs fan out. Harmless at scale: once
        # totalBytes/parallelism exceeds 512 KiB the formula ignores it,
        # so 100 TB inputs still split at maxPartitionBytes (128 MiB).
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .config("spark.ui.enabled", "false")
        # keep stderr artifacts (bench evidence lines) un-mangled
        .config("spark.ui.showConsoleProgress", "false")
        # Right-sized, not maximal: an oversized heap measurably slows GC
        # on local[32] (empirically ~1.5-2s per heavy query at 24g+ vs 8g
        # for sf0.1 workloads). Override via SPARK_GRAFT_DRIVER_MEM or the
        # parameter when a workload genuinely needs more.
        .config(
            "spark.driver.memory",
            driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
    )
    if enable_iceberg:
        warehouse = iceberg_warehouse or "/tmp/iceberg-warehouse"
        builder = (
            builder.config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config("spark.sql.catalog.iceberg", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.iceberg.type", "hadoop")
            .config("spark.sql.catalog.iceberg.warehouse", warehouse)
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg runtime jar is loadable in this JVM."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False
