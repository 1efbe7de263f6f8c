"""Measure the curation DAG's bucketed materialization mode (SCALING.md).

VERDICT r8 task 4's measurement half: `plans/runner.run(bucket_key=
'doc_id')` writes every doc_id-bearing model boundary as a
bucketed+sorted table so stage-to-stage equi-joins carry zero shuffle
Exchange (plan-asserted in tests/test_plans.py). This tool runs the
SAME pipeline twice on the stress corpus -- plain localCheckpoint
materialization vs bucketed -- and reports wall clock AND total
shuffle write bytes per mode (from the UI REST API, summed over
completed stages between markers), because the structural claim is
about shuffle volume: the bucketed write pays one hash-partition per
boundary (which materialization paid anyway) and every downstream
doc_id join then reads the layout instead of re-shuffling the corpus.

    python tools/bucketed_delta.py <n_docs> [corpus_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _shuffle_write_bytes(ui: str) -> int:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        )
    )
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    import tempfile

    # flags must not be consumed as the positional corpus_dir (round-10
    # review: `1000000 --bucketed-first` silently built the corpus in a
    # cwd directory literally named '--bucketed-first')
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(pos[0])
    corpus_dir = pos[1] if len(pos) > 1 else None

    from tools.dfcap_sweep import ensure_corpus, make_session

    # the byte accounting sums the UI's COMPLETED-stage history; the
    # default retention (1000 stages) can evict early stages between
    # markers and corrupt the delta, so retain far more than two full
    # DAG runs ever produce
    spark = make_session({"spark.ui.retainedStages": "100000"})
    ui = spark.sparkContext.uiWebUrl

    from data_pipeline_spark_iceberg_dbt_airflow_spark.plans.llm_pipeline import (
        build_llm_curation_pipeline,
    )

    own_tmp = None
    if corpus_dir is None:
        own_tmp = tempfile.TemporaryDirectory()
        sf_dir = own_tmp.name
    else:
        sf_dir = corpus_dir
    ensure_corpus(spark, sf_dir, n_docs)

    from data_pipeline_spark_iceberg_dbt_airflow_spark.plans.llm_pipeline import (
        default_sem_k,
    )

    sem_k = default_sem_k(n_docs)
    order = (
        ("bucketed", "plain")
        if "--bucketed-first" in sys.argv
        else ("plain", "bucketed")
    )
    out = {"n_docs": n_docs, "sem_k": sem_k, "order": "->".join(order)}

    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.dedup import (
        release_shingle_index,
    )

    for mode in order:
        # drop the session-cached persisted shingle index so BOTH modes
        # pay the cold build -- without this the second mode ran warm
        # and the comparison silently credited the layout with the
        # cache's savings (round-10 fix; use --bucketed-first to bound
        # any residual same-session warmth in the other direction).
        # KNOWN residual bias: the first mode's localCheckpoint blocks
        # are freed only when Python GC + ContextCleaner get to them,
        # so the second mode's storage memory is not pristine -- run
        # the two modes in both orders and trust the SHUFFLE BYTES
        # (layout-determined, warmth-independent) over the walls
        release_shingle_index(spark)
        runner = build_llm_curation_pipeline(spark, sf_dir, sem_k=sem_k)
        sw0 = _shuffle_write_bytes(ui)
        t0 = time.time()
        if mode == "plain":
            res = runner.run(materialize=True)
        else:
            res = runner.run(
                bucket_key="doc_id",
                bucket_count=32,
                table_prefix=f"bdelta{n_docs}",
            )
        final = res["packed"].count()
        out[f"{mode}_wall_s"] = round(time.time() - t0, 1)
        out[f"{mode}_shuffle_mb"] = round(
            (_shuffle_write_bytes(ui) - sw0) / 1e6, 1
        )
        out[f"{mode}_rows"] = final

    print(json.dumps(out))
    spark.stop()
    if own_tmp is not None:
        own_tmp.cleanup()


if __name__ == "__main__":
    main()
