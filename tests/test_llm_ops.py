"""Tests for the LLM-data operator set (dedup / text / similarity).

Beyond the differential-oracle gate (test_queries_oracle.py covers every
registered query automatically), these assert the properties an oracle
can't see: physical plan shape, LSH recall vs the exhaustive pair set, and
the pandas_udf kernel agreeing with the JVM fold.
"""

from __future__ import annotations

from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import all_queries


def _plan(spark, sf_dir, name: str) -> str:
    df = all_queries()[name].spark_fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _run(spark, sf_dir, name: str):
    return all_queries()[name].spark_fn(spark, sf_dir)


# --- plan shape -------------------------------------------------------------


def test_exact_dedup_is_hash_aggregate_no_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_exact_hash")
    assert "HashAggregate" in plan, plan
    assert "Sort" not in plan, plan


def test_minhash_has_no_cartesian(spark, sf_dir):
    """Candidate generation must be an equi-join on band keys, never an
    all-pairs product of the corpus (the seeds crossJoin is broadcast)."""
    plan = _plan(spark, sf_dir, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan, plan


def test_ngram_jaccard_has_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_ngram_jaccard")
    assert "CartesianProduct" not in plan, plan


def test_ivf_cell_join_is_broadcast_hash(spark, sf_dir):
    """The cell restriction is an equi-join with a broadcast query batch:
    the corpus side must not shuffle."""
    plan = _plan(spark, sf_dir, "sim_topk_ivf")
    assert "BroadcastHashJoin" in plan, plan


def test_bruteforce_query_batch_is_broadcast(spark, sf_dir):
    """Non-equi (self-exclusion) join against a bounded broadcast query
    batch -> BroadcastNestedLoopJoin, with the CORPUS as streamed side."""
    plan = _plan(spark, sf_dir, "sim_topk_bruteforce")
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_text_stats_is_scan_only(spark, sf_dir):
    """Per-row text statistics must not introduce any exchange."""
    plan = _plan(spark, sf_dir, "text_stats")
    assert "Exchange" not in plan, plan


# --- semantics beyond the oracle -------------------------------------------


def test_minhash_recall_vs_exhaustive(spark, sf_dir):
    """LSH candidates, after verification, must recover every pair the
    exhaustive shingle-join finds at the same Jaccard threshold (with
    8 permutations and j >= 0.5 planted dups, expected recall is ~1.0;
    assert exact equality on this corpus)."""
    lsh = {
        (r.doc_a, r.doc_b)
        for r in _run(spark, sf_dir, "dedup_minhash_lsh").collect()
    }
    exact = {
        (r.doc_a, r.doc_b)
        for r in _run(spark, sf_dir, "dedup_ngram_jaccard").collect()
    }
    assert lsh == exact, f"LSH missed {exact - lsh}, extra {lsh - exact}"


def test_pandas_cosine_matches_jvm_fold(spark, sf_dir):
    """The Arrow/NumPy kernel must agree with the JVM left-fold to 1e-9
    and produce the same top-k membership per query."""
    jvm = _run(spark, sf_dir, "sim_topk_bruteforce").collect()
    pnd = _run(spark, sf_dir, "sim_topk_pandas").collect()
    jvm_map = {(r.q_id, r.vec_id): r.cosine for r in jvm}
    pnd_map = {(r.q_id, r.vec_id): r.cosine for r in pnd}
    assert jvm_map.keys() == pnd_map.keys()
    for k, v in jvm_map.items():
        assert abs(v - pnd_map[k]) < 1e-9, (k, v, pnd_map[k])


def test_simhash_fingerprints_cover_tokenful_docs(spark, sf_dir):
    """Every doc with at least one token gets a 16-bit fingerprint."""
    rows = _run(spark, sf_dir, "dedup_simhash").collect()
    assert all(0 <= r.simhash < (1 << 16) for r in rows)
    n_docs = (
        _run(spark, sf_dir, "text_stats").where("token_cnt > 0").count()
    )
    assert len(rows) == n_docs
