"""Calibrated-vs-fixed multi-probe margin A/B (r13, VERDICT r12 task 3).

Runs the composed two-level ``semdedup`` twice over ONE checkpointed
embedding frame -- once with the fit-time calibrated shell
(SHELL_TARGET, the r13 default) and once with the fixed 1.21 envelope
(shell_target=None, the r12 behavior) -- and reports verified drops +
composed wall for each, plus the calibrated probe_factor. This is the
"drops + pair wall vs the fixed 1.21" row the calibration owes
SCALING.md; embeddings are shared so the delta is the probe's alone.

    python tools/probe_ab.py <n_docs> <corpus_dir> [k] [max_iter]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    pos = sys.argv[1:]
    if "--targets" in pos:
        # drop the flag AND its value from the positional scan; guard
        # the value (ADVICE r14: a trailing --targets raised IndexError
        # and a non-numeric list crashed deep in the sweep)
        ti = pos.index("--targets")
        if ti + 1 >= len(pos):
            raise SystemExit(
                "usage: --targets t1,t2,... -- missing value"
            )
        try:
            [float(t) for t in pos[ti + 1].split(",")]
        except ValueError:
            raise SystemExit(
                "usage: --targets t1,t2,... -- values must be numeric"
            ) from None
        pos = pos[:ti] + pos[ti + 2 :]
    n_docs = int(pos[0])
    sf_dir = pos[1]
    k = (
        int(pos[2])
        if len(pos) > 2
        else __import__(
            "data_pipeline_spark_iceberg_dbt_airflow_spark.plans.llm_pipeline",
            fromlist=["default_sem_k"],
        ).default_sem_k(n_docs)
    )
    max_iter = int(pos[3]) if len(pos) > 3 else 5

    from tools.dfcap_sweep import ensure_corpus, make_session

    spark = make_session()
    ensure_corpus(spark, sf_dir, n_docs)

    import data_pipeline_spark_iceberg_dbt_airflow_spark.operators.hier_kmeans as HK
    from data_pipeline_spark_iceberg_dbt_airflow_spark.io import read_table
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.semdedup import (
        DEFAULT_EPS,
        semdedup,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.text import (
        hash_embed_checkpointed,
    )

    out = {"n_docs": n_docs, "k": k, "max_iter": max_iter}
    docs = read_table(spark, sf_dir, "documents", widen=True)
    t0 = time.time()
    emb = hash_embed_checkpointed(docs.select("doc_id", "text"))
    out["embed_s"] = round(time.time() - t0, 1)

    orig_fit = HK.hier_kmeans_fit

    def run(tag, shell_target):
        def patched(*a, **kw):
            kw["shell_target"] = shell_target
            model = orig_fit(*a, **kw)
            out[f"{tag}_probe_factor"] = model.probe_factor
            return model

        HK.hier_kmeans_fit = patched
        try:
            t0 = time.time()
            verdicts = semdedup(
                emb,
                k=k,
                eps=DEFAULT_EPS,
                fit_sample=50 * k,
                corpus_rows=n_docs,
                two_level=True,
                max_iterations=max_iter,
            )
            out[f"{tag}_drops"] = verdicts.where(~F.col("keep")).count()
            out[f"{tag}_wall_s"] = round(time.time() - t0, 1)
        finally:
            HK.hier_kmeans_fit = orig_fit

    if "--targets" in sys.argv:
        # r14 (VERDICT r13 #5): the SHELL_TARGET frontier -- sweep the
        # chosen shell fractions over the SAME checkpointed embeddings
        # (fixed envelope first as the anchor), so SCALING.md can show
        # whether 0.20 sits on the knee of the drops-vs-wall curve.
        targets = [
            float(t)
            for t in sys.argv[sys.argv.index("--targets") + 1].split(",")
        ]
        run("fixed", None)
        for t in targets:
            run(f"t{int(round(t * 100)):02d}", t)
    else:
        # fixed FIRST so session warmup biases against the r12 baseline,
        # not the new default
        run("fixed", None)
        run("cal", HK.SHELL_TARGET)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
