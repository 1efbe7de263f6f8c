"""Capture .explain('formatted') output for registry queries.

    python tools/capture_plans.py <out_dir> [suffix] [name ...]

Writes <out_dir>/<query>_<suffix>.txt (suffix default 'before') for each
named query (default: every bench=True query) against $SPARK_GRAFT_SF_DIR
(default sf0.1). Evidence artifacts for the optimization rounds: the
plan shape (Exchange count, join strategy, PushedFilters/ReadSchema,
codegen spans, Python eval nodes) before and after each change.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import all_queries
from data_pipeline_spark_iceberg_dbt_airflow_spark.session import get_spark_session


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark_session("capture-plans")
    specs = all_queries()
    if not names:
        names = [n for n, s in specs.items() if s.bench]
    for name in names:
        df = specs[name].spark_fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
