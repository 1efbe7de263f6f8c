"""Three same-session Lloyd fits at identical inputs: the r11 variance
pin (VERDICT r10 task 7).

kmeans_fit is bit-deterministic in its MODEL (decimal sums, md5-ranked
sample), so run-to-run wall spread at identical inputs is pure
execution noise -- but an uncapped fit integrates that noise over up to
MAX_KMEANS_ITERATIONS rounds (r10 measured 24.7-43.2s at 1M). This tool
measures the wall band of three back-to-back fits at a given iteration
cap so the DAG default can be chosen to keep stage walls comparable
across rounds; the companion drop-sensitivity number (does the cap
change semdedup's verdicts?) comes from tools/sem_attrib.py runs at the
two caps.

    python tools/fit_variance.py <n_docs> <corpus_dir> <k> <max_iter> [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1])
    corpus_dir = sys.argv[2]
    k = int(sys.argv[3])
    max_iter = int(sys.argv[4])
    runs = int(sys.argv[5]) if len(sys.argv) > 5 else 3

    from tools.dfcap_sweep import ensure_corpus, make_session

    spark = make_session()
    ensure_corpus(spark, corpus_dir, n_docs)

    from data_pipeline_spark_iceberg_dbt_airflow_spark.io import read_table
    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.kmeans import (
        kmeans_fit,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.text import (
        hash_embed_checkpointed,
    )

    docs = read_table(spark, corpus_dir, "documents", widen=True)
    emb = hash_embed_checkpointed(docs.select("doc_id", "text"))
    emb.count()  # embed once, outside every timed fit

    walls = []
    models = []
    for _ in range(runs):
        t0 = time.time()
        c = kmeans_fit(
            emb,
            k,
            id_col="vec_id",
            vec_col="embedding",
            fit_sample=50 * k,
            max_iterations=max_iter,
        )
        walls.append(round(time.time() - t0, 1))
        # model fingerprint: determinism means all runs must agree
        models.append(hash(tuple(sorted((i, tuple(v)) for i, v in c.items()))))
    out = {
        "n_docs": n_docs,
        "k": k,
        "max_iterations": max_iter,
        "walls_s": walls,
        "band": round(max(walls) / max(min(walls), 1e-9), 2),
        "models_identical": len(set(models)) == 1,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
