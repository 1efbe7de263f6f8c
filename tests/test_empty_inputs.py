"""Empty-input differential sweep.

At 100 TB, filters, partition pruning, and backfill windows routinely hand
operators ZERO rows -- and empty inputs are where operator edge cases live
(aggregates over nothing, sequence(0, -1), min/max of an empty window,
joins with an empty build side). This sweep runs EVERY registered query,
Spark vs DuckDB, over schema-preserving empty copies of all ten tables.

Fixture note: the empty copies are written by DuckDB from `LIMIT 0` reads
of sf0.001, which preserves column types except TIMESTAMP(NANOS) -> µs --
which is exactly what a real user's ordinary parquet looks like, so the
sweep doubles as a they-brought-their-own-files robustness check.

Known, documented divergence: Spark's CUBE/ROLLUP omit the grand-total
grouping-set row on empty input, while DuckDB (per the SQL standard's
GROUP BY () semantics) emits one all-NULL row with count 0. Asserted
explicitly below so a behavior change in either engine fails loudly.
"""

from __future__ import annotations

import duckdb
import pytest

from data_pipeline_spark_iceberg_dbt_airflow_spark.io import TABLES, table_path
from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import all_queries
from tests.oracle import compare, run_oracle

#: Queries whose Spark-vs-DuckDB behavior LEGITIMATELY differs on empty
#: input, with the reason; asserted specifically instead of compared.
EMPTY_DIVERGENCES = {
    "agg_cube_grouping": "Spark CUBE emits no grouping sets over an empty "
    "input; SQL-standard GROUP BY () (DuckDB) emits the grand-total row",
}


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("empty_sf")
    con = duckdb.connect()
    try:
        for t in TABLES:
            src = table_path("/root/testdata/sf0.001", t)
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}') LIMIT 0)"
                f" TO '{base / (t + '.parquet')}' (FORMAT PARQUET)"
            )
    finally:
        con.close()
    return str(base)


def test_every_query_survives_empty_inputs(spark, empty_sf_dir):
    failures = []
    for name, spec in all_queries().items():
        try:
            df = spec.spark_fn(spark, empty_sf_dir)
            if name in EMPTY_DIVERGENCES:
                assert df.count() == 0
                assert len(run_oracle(spec.oracle, empty_sf_dir)) == 1
            elif spec.oracle is not None:
                compare(df, run_oracle(spec.oracle, empty_sf_dir))
            else:
                df.count()
        except Exception as ex:  # collect all, report once
            failures.append(f"{name}: {type(ex).__name__} {str(ex)[:160]}")
    assert not failures, "\n".join(failures)


def test_round4_operators_survive_empty_inputs(spark, tmp_path):
    """The non-registry round-4 operators hold the same contract the
    registry's empty sweep enforces: empty in, empty (or well-defined
    degenerate) out -- never a crash."""
    from pyspark.sql import functions as F

    from data_pipeline_spark_iceberg_dbt_airflow_spark.io import corpus_diff
    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.bloom import (
        blocklist_screen,
        bloom_build,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.dedup import (
        strip_boilerplate,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.text import (
        hash_embed,
        lm_score_docs,
        train_bigram_lm,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.training import (
        chunk_cdc,
        weighted_sample,
    )

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_keys = spark.createDataFrame([], "k string")
    corpus = spark.createDataFrame([(1, "alive")], "doc_id long, k string")

    assert chunk_cdc(empty_docs).count() == 0
    assert strip_boilerplate(empty_docs).count() == 0
    assert hash_embed(empty_docs).count() == 0
    uni, bi, n, v = train_bigram_lm(empty_docs)
    assert (n, v) == (0, 0)
    assert lm_score_docs(empty_docs, uni, bi, n, v).count() == 0
    assert (
        weighted_sample(
            empty_docs.withColumn("w", F.lit(1.0)), 5, "w"
        ).count()
        == 0
    )
    assert bloom_build(empty_keys, "k", num_bits=64) == [0]
    # empty blocklist: everything passes
    kept = blocklist_screen(corpus, empty_keys, "k")
    assert kept.count() == 1
    sk = cms_build(empty_keys.select(F.col("k").alias("token")), "token", 64)
    assert sk.count() == 0
    probes = spark.createDataFrame([("x",)], "token string")
    assert cms_estimate(sk, probes, "token", 64).collect()[0]["est"] == 0

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for p in (a, b):
        spark.createDataFrame([], "doc_id long, digest string").write.parquet(p)
    assert corpus_diff(spark, a, b).count() == 0


def test_round5_operators_survive_empty_inputs(spark):
    """Round-5 additions hold the empty-input contract: empty in, empty
    out -- never a crash."""
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.dedup import (
        mask_repeated_spans,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.semdedup import (
        semdedup,
    )

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert mask_repeated_spans(empty_docs).count() == 0

    # semdedup needs at least one vector to fit a model; on an empty
    # corpus it must fail LOUDLY (kmeans_fit's explicit guard), not hang
    # or return garbage
    import pytest

    empty_emb = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        semdedup(empty_emb, k=2)

    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.bpe import (
        bpe_encode,
        train_bpe,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.dedup import (
        containment_pairs,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.text import (
        normalize_text,
    )

    assert normalize_text(empty_docs).count() == 0
    assert train_bpe(empty_docs, 5) == []
    assert bpe_encode(empty_docs, [("a", "b")]).count() == 0
    empty_sh = spark.createDataFrame([], "doc_id long, sid long, n_sh long")
    assert containment_pairs(empty_sh).count() == 0
