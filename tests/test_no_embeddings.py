"""Embeddings-less corpus sweep.

A text-only corpus directory -- documents.parquet and the relational
tables, but NO embeddings.parquet -- is a completely ordinary input for
a curation pipeline (tools/curation_stress.py writes exactly that
shape). Round 7 shipped a guard too narrow for it: the semantic branch
of ``dedup_cluster_components`` caught only ValueError while
``read_table`` raises FileNotFoundError from the pyarrow footer probe,
so the registry entry -- and the whole curation DAG -- crashed on any
corpus without an embeddings table (VERDICT r7, ADVICE r7). This sweep
pins the recovered contract: every registry entry is exercised against
the embeddings-less copy; entries whose SEMANTICS require the
embeddings table fail with the missing-table error (declared in
EMB_REQUIRED, asserted exactly -- an addition to the registry that
reads embeddings must either degrade or be declared here), everything
else runs and, where oracled, still hash-matches DuckDB over the same
directory.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark_iceberg_dbt_airflow_spark.io import TABLES, table_path
from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import all_queries
from tests.oracle import compare, run_oracle

#: Entries whose contract IS a computation over the embeddings table --
#: a missing table is a legitimate loud failure for these, nothing else.
EMB_REQUIRED = {
    "scalar_array_ops",
    "sim_topk_bruteforce",
    "sim_ann_family",
    "sim_topk_pandas",
}

#: Entries that read embeddings but must DEGRADE without it (their
#: oracle references the absent view, so only the Spark side runs here;
#: the degraded shape gets its own focused test below).
EMB_DEGRADES = {"dedup_cluster_components"}


@pytest.fixture(scope="module")
def noemb_sf_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("noemb_sf")
    for t in TABLES:
        if t == "embeddings":
            continue
        shutil.copyfile(
            table_path("/root/testdata/sf0.001", t),
            str(base / f"{t}.parquet"),
        )
    return str(base)


def test_every_query_survives_missing_embeddings(spark, noemb_sf_dir):
    assert not os.path.exists(table_path(noemb_sf_dir, "embeddings"))
    failures = []
    for name, spec in all_queries().items():
        try:
            df = spec.spark_fn(spark, noemb_sf_dir)
            if name in EMB_REQUIRED:
                failures.append(
                    f"{name}: declared EMB_REQUIRED but ran without the table"
                )
            elif name in EMB_DEGRADES or spec.oracle is None:
                df.count()
            else:
                compare(df, run_oracle(spec.oracle, noemb_sf_dir))
        except Exception as ex:  # collect all, report once
            if name in EMB_REQUIRED and isinstance(
                ex, (FileNotFoundError, OSError)
            ):
                continue  # the legitimate loud failure
            failures.append(f"{name}: {type(ex).__name__} {str(ex)[:160]}")
    assert not failures, "\n".join(failures)


def test_cluster_components_degrade_to_lexical_rows(spark, noemb_sf_dir):
    """Without an embeddings table the registry entry must equal the
    lexical branch exactly -- zero semantic rows, no crash (mirroring
    the oracle's seed-count gate, which yields zero semantic rows for
    the same corpus)."""
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.dedup import (
        dedup_cluster_components,
        lexical_components,
    )

    got = dedup_cluster_components(spark, noemb_sf_dir)
    assert got.where(F.col("method") != "ngram").count() == 0
    want = lexical_components(spark, noemb_sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_curation_dag_runs_without_embeddings(spark, noemb_sf_dir):
    """The composed curation DAG on a text-only corpus: every stage
    materializes, the canonical-dedup invariant holds -- the exact
    end-to-end path tools/curation_stress.py drives."""
    from data_pipeline_spark_iceberg_dbt_airflow_spark.plans.llm_pipeline import (
        run_llm_curation,
    )

    out = run_llm_curation(spark, noemb_sf_dir, materialize=True)
    cur = out["curated"]
    cur_n = cur.count()
    assert 0 < cur_n < out["raw_documents"].count()
    per_cluster = (
        cur.join(
            out["doc_clusters"].select("doc_id", "cluster_id"), "doc_id"
        )
        .groupBy("cluster_id")
        .count()
    )
    assert per_cluster.where("count > 1").count() == 0
    assert out["assigned"].count() == cur_n
