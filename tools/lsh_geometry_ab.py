"""Same-session, order-controlled A/B of the MinHash geometry at scale
(VERDICT r10 task 5: split the ~2s documented 16-perm geometry cost out
of the asserted ambient drift in the 1M doc_clusters wall).

Runs lexical_components twice in ONE session -- once at HEAD geometry
(16 perms / 8x2 bands), once at the round-9 geometry (8 perms / 4x2) --
releasing the persisted shingle index and Spark caches between modes so
neither rides the other's warm state (the r10 bucketed-delta lesson),
and taking the mode order from argv so a reversed run can bound the
residual session-warmup bias.

    python tools/lsh_geometry_ab.py <n_docs> <corpus_dir> [8first|16first]
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
    order = sys.argv[3] if len(sys.argv) > 3 else "16first"

    from tools.dfcap_sweep import ensure_corpus, make_session

    spark = make_session()
    ensure_corpus(spark, corpus_dir, n_docs)

    from data_pipeline_spark_iceberg_dbt_airflow_spark.queries import dedup

    def run(num_perm: int) -> dict:
        dedup.NUM_PERM = num_perm
        t0 = time.time()
        df = dedup.lexical_components(spark, corpus_dir)
        n_rows = df.count()
        n_clusters = df.select("cluster_id").distinct().count()
        wall = round(time.time() - t0, 1)
        # cold next mode: drop the shared shingle index and every cache
        dedup.release_shingle_index(spark)
        spark.catalog.clearCache()
        return {
            "num_perm": num_perm,
            "wall_s": wall,
            "rows": n_rows,
            "clusters": n_clusters,
        }

    modes = [16, 8] if order == "16first" else [8, 16]
    out = {"n_docs": n_docs, "order": order, "runs": [run(m) for m in modes]}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
