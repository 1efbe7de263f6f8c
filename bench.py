"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is timed end-to-end (plan + execute + collect-to-count) after a
one-time session warmup, mirroring how a scheduled pipeline run would pay
costs. Queries marked ``bench=True`` in the registry are the headline set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import all_queries
from data_pipeline_spark_iceberg_dbt_airflow_spark.session import get_spark_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark_session("bench", driver_memory="48g")

    specs = {n: s for n, s in all_queries().items() if s.bench}
    # Warm up the JVM + parquet footer caches once so per-query numbers
    # measure the engine, not first-touch JIT.
    next(iter(specs.values())).spark_fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        t0 = time.perf_counter()
        n = spec.spark_fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
