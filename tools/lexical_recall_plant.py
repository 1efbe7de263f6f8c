"""End-to-end lexical-rung recall against the PLANTED truth (r12).

VERDICT r11 task 4 asks for a 4M recall figure beside the survivor-
invariance claim. The exact inverted-index reference pair set is
disk-infeasible at 4M on this box (the r12 attempt spilled >70 GB in
the exact path's pair join), so this tool measures recall on the
KNOWN-TRUE planted pairs of the stress corpus instead (deterministic
membership, any N): doc i with i%10==1 is a one-token-changed
near-copy of doc i-1 (true Jaccard ~0.85), doc i with i%50==7 is an
exact copy of doc i-5. A pair counts as recovered when
``lexical_components`` co-clusters it -- the full rung (digest
collapse + banded MinHash + verification + connected components), not
just candidate generation. Also reports the canonical rate (distinct
clusters / N), the survivor-invariance number.

    python tools/lexical_recall_plant.py <n_docs> <corpus_dir>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    n_docs = int(sys.argv[1])
    sf_dir = sys.argv[2]

    from tools.dfcap_sweep import ensure_corpus, make_session

    # r16 (VERDICT r15 #3): the 8M rung died ENOSPC inside the
    # minhash/verify spill at ~70GB free (~85-90GB needed with lz4).
    # zstd on shuffle+spill buys the missing ~15GB+ of scratch -- a
    # recall-session-only knob: recall is a feasibility/correctness
    # figure, so its walls are not compared against lz4 rounds.
    spark = make_session(
        extra_conf={"spark.io.compression.codec": "zstd"}
    )
    ensure_corpus(spark, sf_dir, n_docs)

    from data_pipeline_spark_iceberg_dbt_airflow_spark.operators.layout import (
        bucket_count_for,
    )
    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries.dedup import (
        lexical_components,
        materialize_shingle_index,
        release_shingle_index,
    )

    def gc_nudge() -> None:
        # ContextCleaner frees dead shuffle generations only after a
        # JVM GC -- nudge between rungs so scratch tracks the live stage
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    t0 = time.time()
    # r14: above the in-memory comfort envelope the raw+index cache
    # tiers (~35-45GB at 8M) plus the verify job's live shuffle
    # generations ENOSPC this box -- the r13 16M recall death, and the
    # r14 first 8M attempt's. The composed DAG survives the same sizes
    # because its index is a DISK-BACKED bucketed table with no memory
    # tiers; give the recall run the production shape (and a GC nudge
    # so the build's dead shuffle files free before the verify job).
    # Bucket count corpus-scaled since r15 (the production default).
    materialize_shingle_index(
        spark, sf_dir, "recallplant_shingle_index", bucket_count_for(n_docs)
    )
    gc_nudge()
    comp = lexical_components(spark, sf_dir).select(
        "doc_id", "cluster_id"
    )
    comp = comp.localCheckpoint(eager=True)
    wall = round(time.time() - t0, 1)
    # everything after this point reads only ``comp`` (2 longs/doc):
    # drop the index table and its cache entry so the recall joins run
    # beside a clean warehouse, and free the rung's dead shuffle files
    release_shingle_index(spark)
    spark.sql("DROP TABLE IF EXISTS recallplant_shingle_index")
    gc_nudge()

    a = comp.alias("a")
    b = comp.alias("b")

    def pair_recall(offset: int, mod: int, rem: int, min_id: int):
        # planted pair (i-offset, i) for i % mod == rem, i >= min_id
        pairs = (
            a.where(
                (F.col("a.doc_id") % mod == rem)
                & (F.col("a.doc_id") >= min_id)
            )
            .join(
                b,
                F.col("b.doc_id") == F.col("a.doc_id") - offset,
            )
            .select(
                (
                    F.col("a.cluster_id") == F.col("b.cluster_id")
                ).alias("hit")
            )
        )
        agg = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("hit").cast("long")).alias("hits"),
        ).collect()[0]
        return int(agg["n"]), int(agg["hits"])

    n_nd, h_nd = pair_recall(1, 10, 1, 1)
    n_ex, h_ex = pair_recall(5, 50, 7, 7)
    n_clusters = comp.select("cluster_id").distinct().count()
    out = {
        "n_docs": n_docs,
        "components_wall_s": wall,
        "planted_neardup_pairs": n_nd,
        "neardup_recovered": h_nd,
        "neardup_recall": round(h_nd / n_nd, 5) if n_nd else None,
        "planted_exact_pairs": n_ex,
        "exact_recovered": h_ex,
        "exact_recall": round(h_ex / n_ex, 5) if n_ex else None,
        "canonical_rate": round(n_clusters / n_docs, 5),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
