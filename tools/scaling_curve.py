"""Reproduce SCALING.md's measured scaling curve.

Runs every benched registry query at sf0.001/0.01/0.1 (best-of-3, warm
codegen, caches released between runs) and prints per-query times plus
the 100x wall-clock ratio. Usage: python tools/scaling_curve.py
"""

import time, sys
sys.path.insert(0, '.')
from data_pipeline_spark_iceberg_dbt_airflow_spark.session import get_spark_session
from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import all_queries
from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.dedup import release_shingle_index
from pyspark.sql import functions as F

spark = get_spark_session("scaling-curve")
specs = {n: s for n, s in all_queries().items() if s.bench}

def force(df):
    return df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")).agg(
        F.count(F.lit(1)).alias("n"), F.max("h").alias("chk")).collect()[0]["n"]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
# warm codegen on the smallest
for s in specs.values():
    force(s.spark_fn(spark, SFS[0]))
spark.catalog.clearCache(); release_shingle_index()

out = {}
for name, s in sorted(specs.items()):
    row = []
    for sf in SFS:
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            force(s.spark_fn(spark, sf))
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache(); release_shingle_index()
        row.append(best)
    out[name] = row
    print(f"{name}\t{row[0]:.3f}\t{row[1]:.3f}\t{row[2]:.3f}\t{row[2]/row[0]:.1f}x", flush=True)
spark.stop()
