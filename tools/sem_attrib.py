"""Per-term attribution of the semantic-dedup stage at scale (SCALING.md).

VERDICT r8 task: the 1M `sem_deduped` stage wall needs the same honest
per-term split the lexical stage got -- embed / fit / bulk assignment /
blocked in-cell pairs / connected components. This tool times each term
through the SAME building blocks `queries/semdedup.semdedup` composes
(hash_embed, kmeans_fit(fit_sample=...), assign_clusters,
blocked_cell_pairs, connected_components), with a materialization
barrier between terms so each wall is one term's cost, then runs the
composed `semdedup` end-to-end for the total (the residual over the sum
of terms is the cos_centroid scoring + survivor join the composition
adds).

Runs on the curation stress corpus (tools/curation_stress.make_corpus)
with the DAG's sizing rules (k = N/250, fit_sample = 50*k) -- the raw
corpus, not the post-gate ~80% subset the in-DAG stage sees, so terms
here are ~1.25x the in-DAG stage at the same nominal N; the split, not
the absolute, is the measurement.

    python tools/sem_attrib.py <n_docs> [corpus_dir] [k] [max_iter] [flat|two] [fixed|cal]

The optional 5th arg selects the quantizer: ``flat`` (default below the
SEM_TWO_LEVEL_BOUND crossover) or ``two`` for the r12 hierarchical
path (operators/hier_kmeans) -- omitted, the tool follows the DAG's own
default for the given n_docs, so a bare invocation always measures the
composed-defaults configuration. The optional 6th arg (r13) pins the
multi-probe margin: ``fixed`` = the 1.21 envelope (shell_target=None,
the r12 behavior) for the calibrated-vs-fixed A/B; default/'cal' = the
fit-time calibrated shell.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    N_DOCS = int(sys.argv[1])
    CORPUS_DIR = sys.argv[2] if len(sys.argv) > 2 else None
    # optional k override (argv[3]) for the cell-sizing experiment:
    # assignment work ~ N*k, in-cell pair work ~ N*(N/k) -- balanced
    # at k ~ sqrt(N), vs the DAG's default k = N/250
    K_OVERRIDE = int(sys.argv[3]) if len(sys.argv) > 3 else None
    # optional Lloyd cap override (argv[4]) for the r11 fit-variance /
    # drop-sensitivity experiment (VERDICT r10 task 7)
    MAX_ITER = int(sys.argv[4]) if len(sys.argv) > 4 else None
    # optional quantizer override (argv[5]): flat | two; default = the
    # DAG's own gate (two-level above SEM_TWO_LEVEL_BOUND, r12)
    QUANT = sys.argv[5] if len(sys.argv) > 5 else None
    # optional probe-margin mode (argv[6], r13): 'fixed' disables the
    # fit-time shell calibration (shell_target=None -> the 1.21
    # envelope, the r12 behavior) for the calibrated-vs-fixed A/B;
    # default = the calibrated HEAD default
    PROBE = sys.argv[6] if len(sys.argv) > 6 else None
    if PROBE not in (None, "fixed", "cal"):
        raise SystemExit(f"argv[6] must be fixed|cal, got {PROBE!r}")
    if PROBE == "fixed":
        import data_pipeline_spark_iceberg_dbt_airflow_spark.operators.hier_kmeans as _HK  # noqa: E501

        _orig_fit = _HK.hier_kmeans_fit

        def _fixed_fit(*a, **kw):
            kw["shell_target"] = None
            return _orig_fit(*a, **kw)

        _HK.hier_kmeans_fit = _fixed_fit

    from tools.dfcap_sweep import ensure_corpus, make_session

    spark = make_session()

    from data_pipeline_spark_iceberg_dbt_airflow_spark.io import read_table
    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.graph import (
        connected_components,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.kmeans import (
        assign_clusters,
        kmeans_fit,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.semdedup import (
        DEFAULT_EPS,
        pair_kernel_default,
        semdedup,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.similarity import (
        blocked_cell_pairs,
        norm,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.text import (
        hash_embed_checkpointed,
    )

    own_tmp = None
    if CORPUS_DIR is None:
        own_tmp = tempfile.TemporaryDirectory()
        sf_dir = own_tmp.name
    else:
        sf_dir = CORPUS_DIR
    ensure_corpus(spark, sf_dir, N_DOCS)

    from data_pipeline_spark_iceberg_dbt_airflow_spark.plans.llm_pipeline import (
        default_sem_k,
    )

    from data_pipeline_spark_iceberg_dbt_airflow_spark.plans.llm_pipeline import (
        SEM_TWO_LEVEL_BOUND,
    )

    k = K_OVERRIDE if K_OVERRIDE is not None else default_sem_k(N_DOCS)
    fit_sample = 50 * k
    two_level = (
        QUANT == "two" if QUANT else N_DOCS > SEM_TWO_LEVEL_BOUND
    )
    out = {
        "n_docs": N_DOCS,
        "k": k,
        "fit_sample": fit_sample,
        "two_level": two_level,
        "probe": PROBE or "cal-default",
    }

    docs = read_table(spark, sf_dir, "documents", widen=True)

    t0 = time.time()
    # the producer enforces checkpoint-before-zero-filter (the round-8
    # derived-filter trap); same frame the DAG's sem stage builds
    emb = hash_embed_checkpointed(docs.select("doc_id", "text"))
    out["embed_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    fit_kwargs = {} if MAX_ITER is None else {"max_iterations": MAX_ITER}
    out["max_iterations"] = MAX_ITER if MAX_ITER is not None else "default"
    if two_level:
        from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.hier_kmeans import (
            assign_clusters_hier,
            hier_kmeans_fit,
        )

        model = hier_kmeans_fit(
            emb,
            k,
            id_col="vec_id",
            vec_col="embedding",
            fit_sample=fit_sample,
            **fit_kwargs,
        )
        centroids = model.fine
        out["k_coarse"] = len(model.coarse)
        out["k_fine"] = len(model.fine)
    else:
        centroids = kmeans_fit(
            emb,
            k,
            id_col="vec_id",
            vec_col="embedding",
            fit_sample=fit_sample,
            **fit_kwargs,
        )
    out["fit_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    assigned = (
        assign_clusters_hier(emb, model)
        if two_level
        else assign_clusters(emb, centroids)
    ).localCheckpoint(eager=True)
    out["assign_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    proj = assigned.where(F.col("cluster").isNotNull()).select(
        "vec_id",
        F.col("cluster").alias("label"),
        "embedding",
        norm(F.col("embedding")).alias("nrm"),
    )
    edges = (
        blocked_cell_pairs(
            proj,
            threshold=1.0 - DEFAULT_EPS,
            # the same scale switch semdedup applies (round 10: the
            # candidate-count proxy, not k*dim), spelled from the same
            # helper -- fed the FITTED cell count (a collapsing fit can
            # return fewer centroids than the requested k, and fewer
            # cells means MORE candidates, so the requested-k proxy
            # would understate pair cost exactly when it matters)
            kernel=pair_kernel_default(N_DOCS, len(centroids)),
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    out["pairs_s"] = round(time.time() - t0, 1)
    out["n_edges"] = edges.count()

    t0 = time.time()
    comp = connected_components(edges)
    out["components"] = comp.count()
    out["cc_s"] = round(time.time() - t0, 1)

    out["terms_total_s"] = round(
        sum(out[x] for x in ("embed_s", "fit_s", "assign_s", "pairs_s", "cc_s")),
        1,
    )

    # composed end-to-end on the same checkpointed embeddings: the
    # delta over terms_total is cos_centroid scoring + the survivor
    # groupBy/join (and re-running assignment inside)
    t0 = time.time()
    verdicts = semdedup(
        emb,
        k=k,
        eps=DEFAULT_EPS,
        fit_sample=fit_sample,
        corpus_rows=N_DOCS,
        two_level=two_level,
        **({} if MAX_ITER is None else {"max_iterations": MAX_ITER}),
    )
    out["dropped"] = verdicts.where(~F.col("keep")).count()
    out["semdedup_total_s"] = round(time.time() - t0, 1)

    print(json.dumps(out))
    spark.stop()
    if own_tmp is not None:
        own_tmp.cleanup()


if __name__ == "__main__":
    main()
